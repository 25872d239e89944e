"""Text-analysis operators for large-scale training-data pipelines.

All hot-path computation is JVM-side (built-in functions over the pinned
tokenizer's output arrays) so it stays inside whole-stage codegen — no
Python in the per-row path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_60
from ..functions.tokenizer import shingles_of, tokenize_col

# per-language stopword profiles for the n-gram/stopword-hit language-ID
# heuristic (tiny, broadcast as literals)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "pas", "que", "pour", "dans"],
    "ko": ["삼성", "전자", "재무제표", "분기", "보고서", "감사", "연결", "손익"],
}


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace/regex token counting — JVM size(tokenize)."""
    return df.withColumn(out, F.size(tokenize_col(text_col)).cast("long"))


# GPT-2-style pretokenizer (public: Radford et al. 2019 / tiktoken docs),
# adapted to the RE2 ∩ java.util.regex common subset: the original's
# trailing-whitespace lookahead `\s+(?!\S)` is dropped (RE2 has no
# lookahead), which merges a pretoken boundary at line ends — a documented,
# engine-consistent simplification. Estimates LLM token counts far better
# than word counts (contractions, digit runs, punctuation runs split out).
BPE_PRETOKEN_PATTERN = (
    r"'(s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
)


def with_bpe_pretoken_count(
    df: DataFrame, text_col: str = "text", out: str = "n_pretokens"
) -> DataFrame:
    """BPE-ish token-count estimate: the number of GPT-2 pretokenizer
    matches (the units BPE merges operate within). Pure JVM regexp —
    whole-stage codegen, no UDF."""
    return df.withColumn(
        out,
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), 0)
        ).cast("long"),
    )


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Quality-scoring signal columns (length / punctuation / stopword
    ratios). Returned as named expressions so callers can select any subset."""
    c = F.col(text_col)
    n_chars = F.length(c)
    tokens = tokenize_col(text_col)
    n_tokens = F.size(tokens)
    n_alnum = F.length(F.regexp_replace(c, r"[^0-9A-Za-z가-힣一-鿿]", ""))
    stop = F.array([F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(tokens), stop))
    mean_tok_len = F.when(
        n_tokens > 0, n_alnum.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alnum_ratio": (n_alnum.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")),
        "stopword_hits": n_stop.cast("long"),
        "mean_token_len": mean_tok_len,
    }


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_columns(text_col)
    for name, expr in cols.items():
        if name in df.columns:
            name = f"q_{name}"
        df = df.withColumn(name, expr)
    return df


def with_langid(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID: score = |distinct tokens ∩ profile|,
    argmax over languages, 'und' when nothing matches. Pure JVM arrays."""
    toks = F.array_distinct(tokenize_col(text_col))
    scores = []
    for lang, words in LANG_PROFILES.items():
        prof = F.array([F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, prof)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out, F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out: str = "fingerprint",
    k: int = 8,
    hash_fn: Callable[[Column], Column] = md5_60,
) -> DataFrame:
    """Document fingerprint: min-k over rolling 3-token shingle hashes
    (winnowing-style), packed as sorted array<long>. JVM-only: shingles via
    sliced zip_with (see tokenizer.shingles_of), hash per shingle,
    slice(array_sort).
    ``hash_fn`` defaults to the portable md5-based 60-bit hash so the output
    is reproducible in DuckDB (pass F.xxhash64 for max speed when oracle
    parity is not needed)."""
    toks = tokenize_col(text_col)
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.transform(shingles_of(toks, 3, ""), hash_fn),
    ).otherwise(F.array(hash_fn(F.concat_ws("", toks))))
    return df.withColumn(out, F.slice(F.array_sort(F.array_distinct(shingles)), 1, k))


class UnigramLM:
    """Add-α-smoothed unigram language model fitted on a reference corpus —
    the CCNet/Gopher-style quality signal: documents whose token
    distribution diverges from the reference get high perplexity and are
    filtered/bucketed before LLM training.

    ``counts`` is a (term, cnt) DataFrame; ``total``/``vocab`` are the
    reference token count and vocabulary size. log p(term) =
    ln((cnt + α) / (total + α·(V + 1))); unseen terms take cnt = 0 (the
    ``+ 1`` reserves the OOV mass).

    Scale shape: the fit is one explode + one groupBy(term) — the same
    token-count aggregation every index build already does; the model
    lives as a DataFrame (persist it as parquet next to the corpus, like
    the IVF centroid table — never driver-side JSON at 10^8-term vocab).
    """

    def __init__(self, counts: DataFrame, total: int, vocab: int, alpha: float):
        self.counts = counts
        self.total = total
        self.vocab = vocab
        self.alpha = alpha

    @property
    def denom(self) -> float:
        return float(self.total) + self.alpha * (self.vocab + 1)


def fit_unigram_lm(
    ref: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> UnigramLM:
    toks = ref.select(F.explode(tokenize_col(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total, vocab = counts.agg(
        F.sum("cnt"), F.count(F.lit(1))
    ).first()
    return UnigramLM(counts, int(total or 0), int(vocab or 0), alpha)


def perplexity_scores(
    df: DataFrame,
    model: UnigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy and perplexity under ``model``:
    xent = mean over tokens of -ln p(token), ppl = exp(xent). Documents
    with zero tokens produce no row (no distribution to score — filter
    them with the length gates first).

    Scale shape: one explode, one shuffle join on ``term`` against the
    model table (hash join; the model is the smaller, often broadcastable
    side), one groupBy(``id_col``) — all JVM, no UDFs."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize_col(F.col(text_col))).alias("term")
    )
    j = toks.join(model.counts, "term", "left")
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(model.alpha))
        / F.lit(model.denom)
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.avg(-logp).alias("xent"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .withColumn("ppl", F.exp(F.col("xent")))
    )
