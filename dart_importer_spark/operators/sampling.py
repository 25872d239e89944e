"""Corpus-mixing operators for training-data pipelines.

Two pipeline stages between curation and tokenization:

- :func:`stratified_sample` — deterministic per-stratum downsampling
  (the "mix 30% web, 5% code, 100% books" step). No RNG: membership is
  an affine hash of the row id modulo a prime, so the same row always
  gets the same verdict, reruns are reproducible, resume-safe, and the
  sample is exactly reproducible by any engine (no seed plumbing).
- :func:`pack_chunks` — pretraining sequence packing under the
  concat-then-chunk model: documents are laid out in a deterministic
  order per stream and the token stream is cut every ``budget`` tokens;
  each doc reports its stream offset and the chunk its first token
  lands in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# affine-hash parameters: P prime modulus, A odd multiplier coprime to P.
# (id % P) * A % P is a bijection on [0, P) — max intermediate value
# (P-1)*A ~ 7.9e9 stays far below 2^63, so the arithmetic is exact (and
# identical) in any 64-bit SQL engine; no overflow wrap semantics needed.
_P = 1_000_003
_A = 7_919


def sample_hash(id_col: Column | str) -> Column:
    """The deterministic per-row hash in [0, P): (id % P) * A % P."""
    return F.pmod(F.pmod(F.col(id_col) if isinstance(id_col, str) else id_col, F.lit(_P)) * _A, F.lit(_P))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s iff hash(id) < rate_s · P — an exact,
    deterministic Bernoulli(rate_s) over the id space. Strata missing
    from ``rates`` use ``default_rate`` (0.0 = drop, 1.0 = keep all).

    Scale shape: a single narrow filter — no shuffle, no RNG state, no
    driver involvement; pushes into the scan alongside any other
    predicate. This is the corpus-mixing primitive: rates come from a
    target token distribution computed upstream (one groupBy), and the
    filter is re-runnable (append-only ingest keeps old verdicts)."""
    for s, r in rates.items():
        if not 0.0 <= float(r) <= 1.0:
            raise ValueError(f"stratified_sample: rate for {s!r} not in [0,1]: {r}")
    if not 0.0 <= float(default_rate) <= 1.0:
        raise ValueError(f"stratified_sample: default_rate not in [0,1]")
    h = sample_hash(id_col)
    thr = F.lit(int(float(default_rate) * _P))
    # build the threshold expression stratum by stratum (small dict —
    # this is a CASE WHEN chain, constant-folded by Catalyst)
    expr = thr
    for s, r in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == s, F.lit(int(float(r) * _P))).otherwise(expr)
    return df.filter(h < expr)


def temperature_rates(
    counts: dict[str, int], temperature: float, target_rows: int
) -> dict[str, float]:
    """Multinomial temperature-sampling rates (the mT5/XLM-R corpus-mix
    rule): sample stratum s proportionally to p_s^(1/T), p_s = n_s / N.
    Returns the per-stratum KEEP RATE for a without-replacement sample of
    ~``target_rows`` rows: rate_s = target · q_s / n_s with q ∝ p^(1/T),
    iteratively renormalized when a stratum saturates at rate 1 (a small
    stratum can't contribute more rows than it has; its shortfall is
    redistributed over the unsaturated strata, fixpoint over the ≤#strata
    iterations).

    T=1 reproduces the natural distribution, T→∞ approaches uniform over
    strata, T<1 sharpens toward the big strata. Pure driver-side
    arithmetic over the (tiny) per-stratum count dict; accumulation runs
    in sorted-stratum order so the float result is bit-reproducible by
    any engine that replays the same op order (the DuckDB gate oracle
    does exactly that)."""
    if temperature <= 0:
        raise ValueError(f"temperature_rates: temperature must be > 0, got {temperature}")
    if target_rows < 0:
        raise ValueError("temperature_rates: target_rows must be >= 0")
    total = sum(counts.values())
    if total == 0:
        return {s: 0.0 for s in counts}
    inv_t = 1.0 / float(temperature)
    q_raw = {s: float(n) ** inv_t for s, n in counts.items() if n > 0}
    rates = {s: 0.0 for s in counts}
    active = sorted(q_raw)
    remaining = float(target_rows)
    while active and remaining > 0:
        z = 0.0
        for s in active:  # sorted order — reproducible accumulation
            z = z + q_raw[s]
        saturated = []
        for s in active:
            want = remaining * q_raw[s] / z
            if want >= counts[s]:
                rates[s] = 1.0
                saturated.append(s)
        if not saturated:
            for s in active:
                rates[s] = remaining * q_raw[s] / z / counts[s]
            break
        remaining -= sum(counts[s] for s in saturated)
        active = [s for s in active if s not in saturated]
    return rates


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    temperature: float,
    target_rows: int,
) -> DataFrame:
    """Temperature-based corpus mixing: ONE tiny groupBy for the stratum
    counts (collected — #strata rows), :func:`temperature_rates` on the
    driver, then the :func:`stratified_sample` zero-shuffle hash filter.
    Deterministic end to end: same input → same sample, appends keep old
    verdicts (a row's membership never depends on other rows except
    through the published rates — re-pin the rates for a frozen mix)."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if None in counts:
        # a NULL stratum cannot be sampled (the equality predicate in
        # stratified_sample never matches NULL) and breaks the sorted
        # accumulation in temperature_rates — refuse loudly instead of
        # crashing with a TypeError or silently dropping those rows
        raise ValueError(
            f"temperature_mix: {strata_col!r} contains NULLs "
            f"({counts[None]} rows) — fill or filter them first "
            f"(e.g. coalesce({strata_col}, 'unknown'))"
        )
    rates = temperature_rates(counts, temperature, target_rows)
    return stratified_sample(df, strata_col, rates, id_col)


def pack_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    stream_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each stream (all rows
    if ``stream_col`` is None), lay documents out in (id) order, compute
    each doc's token offset into the stream, and assign it the chunk its
    first token falls in: chunk_id = floor(offset / budget). This is the
    packing model LLM pretraining uses (documents concatenated, stream
    split every `budget` tokens; a doc may straddle a boundary — it is
    reported at its starting chunk).

    Returns (id, stream, n_tokens, offset, chunk_id) ordered by stream,
    offset.

    Scale shape: ONE running-sum window per stream. Streams are the
    parallelism unit — partition the corpus into many streams (e.g. by
    source × hash bucket) so no window sees more than a partition's
    worth; a None stream funnels everything through one task and is only
    for small/test corpora (Spark will warn)."""
    if budget < 1:
        raise ValueError(f"pack_chunks: budget >= 1, got {budget}")
    stream = F.col(stream_col) if stream_col else F.lit(0)
    w = Window.partitionBy(stream).orderBy(F.asc(id_col))
    offset = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    return (
        df.select(
            F.col(id_col).alias("id"),
            stream.alias("stream"),
            F.col(token_col).cast("long").alias("n_tokens"),
            offset.alias("offset"),
        )
        .withColumn("chunk_id", F.floor(F.col("offset") / budget))
        .orderBy("stream", "offset")
    )


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / embedding-prep step):
    split ``text_col`` on whitespace, emit windows of ``size`` tokens
    advancing by ``size - overlap`` (so consecutive chunks share
    ``overlap`` tokens), each chunk re-joined with single spaces. Docs
    with zero tokens produce zero chunks. Output: (id, chunk_id,
    n_tokens, chunk), chunk_id 0-based in document order.

    Scale shape: one projection (split → sequence → explode → slice →
    array_join), all Catalyst — no shuffle, no Python, and the explode
    fan-out is bounded by ceil(n_tokens/stride) per document. The last
    window is the final partial tail only when the stride leaves one
    (identical to the LangChain/llama-index sliding-window convention)."""
    if size < 1:
        raise ValueError(f"chunk_text: size must be >= 1, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"chunk_text: need 0 <= overlap < size, got overlap={overlap}"
        )
    stride = size - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    # windows start at 0, stride, 2·stride, ... while start < n; when the
    # previous window already reached the end (start + size >= n for the
    # PRIOR start), stop — i.e. n_chunks = 1 + max(0, ceil((n - size) / stride))
    n = F.col("__n")
    n_chunks = F.when(
        n <= size, F.lit(1)
    ).otherwise(F.lit(1) + F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int"))
    out = (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("__toks"),
            F.size(toks).alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .select(
            "id",
            "__toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "id",
            "chunk_id",
            F.slice(
                F.col("__toks"), F.col("chunk_id") * stride + 1, size
            ).alias("__w"),
        )
        .select(
            "id",
            "chunk_id",
            F.size("__w").alias("n_tokens"),
            F.array_join("__w", " ").alias("chunk"),
        )
    )
    return out


def shuffle_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic corpus shuffle + train/val/test split — the two
    bookkeeping steps every pretraining pipeline needs to be reproducible
    across reruns AND across engines.

    Each row gets ``shuffle_key`` = md5(seed ":" id): a uniform,
    engine-portable pseudo-random position (md5 hex is identical in
    Spark, DuckDB, Python — no RNG, no nondeterminism under retries or
    partition reshuffles). ``split`` assigns the row to the first named
    split whose cumulative weight threshold (a 32-hex-digit string
    boundary) exceeds its key — so splits are exact-by-construction
    disjoint, stable under appends (a new doc never moves an old one),
    and any engine recomputes the same assignment. A new epoch order is
    just a new ``seed``.

    Scale shape: ONE projection — no shuffle, no RNG state, no driver
    work; ordering by shuffle_key (when the caller wants physical
    shuffle order) is the only sort, and it's the final write's sort.
    """
    bounds = split_bounds(weights)
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    names = list(weights)
    expr = None
    for name, bound in zip(names[:-1], bounds):
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("shuffle_key", h).withColumn("split", split)


def split_bounds(weights: dict[str, float]) -> list[str]:
    """The CANONICAL boundary recipe for :func:`shuffle_split` — one
    32-hex-digit upper bound per split except the last. Exported so an
    external recomputation (a DuckDB oracle, an audit script) uses the
    exact same float accumulation instead of re-deriving boundaries from
    scratch: int(0.9*2**128) and int((0.9+0.05)/1.0*2**128) differ in
    the low bits, and two 'obviously equivalent' derivations would
    disagree on ~2^-53 of keys. String comparison on fixed-length
    lowercase hex == numeric comparison on the 128-bit key; bounds are
    clamped below 2**128 so they stay 32 chars."""
    if not weights:
        raise ValueError("shuffle_split: need at least one split weight")
    if any(float(w) <= 0 for w in weights.values()):
        raise ValueError("shuffle_split: every weight must be > 0")
    total = float(sum(weights.values()))
    names = list(weights)
    bounds, cum = [], 0.0
    for name in names[:-1]:
        cum += float(weights[name]) / total
        bounds.append(
            format(min(int(cum * (1 << 128)), (1 << 128) - 1), "032x")
        )
    return bounds
