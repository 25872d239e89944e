"""sparse_vector (learned-sparse dot product), hybrid_linear (weighted
min-max fusion), stratified_sample and pack_chunks — value-exact
expectations against python recomputation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators.sampling import (
    _A,
    _P,
    pack_chunks,
    stratified_sample,
)
from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def src(transcripts_pdf):
    import numpy as np

    s = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    s["doc_id"] = np.arange(len(s), dtype=np.int64)
    return s


@pytest.fixture(scope="module")
def oracle(src):
    return BM25Oracle(src)


def _sparse_scores(oracle, weights, k1=1.2, b=0.75):
    """score(d) = sum_t w_t * tf/(tf + k1*(1-b+b*dl/avgdl))"""
    dls = [len(t) for t in oracle.tokens]
    avgdl = sum(dls) / len(dls)
    out = {}
    for did, toks in zip(oracle.doc_ids, oracle.tokens):
        s = 0.0
        dl = len(toks)
        for t, w in weights.items():
            tf = toks.count(t)
            if tf:
                s += w * tf / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0:
            out[int(did)] = s
    return out


def test_sparse_vector_values(built_index, oracle):
    weights = {"the": 2.0, "and": 1.0, "of": 0.5}
    got = built_index.sparse_vector(weights, k=15, round_scores=6).toPandas()
    want = _sparse_scores(oracle, weights)
    ranked = sorted(want.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:15]
    assert list(got["doc_id"]) == [d for d, _ in ranked]
    for g, (_, w) in zip(got["score"], ranked):
        assert abs(g - round(w, 6)) < 1e-9


def test_sparse_vector_pruned_is_exhaustive(built_index):
    w = {"the": 3.0, "and": 0.25, "of": 1.5}
    a = built_index.sparse_vector(w, k=20, round_scores=6).collect()
    b = built_index.sparse_vector(w, k=20, round_scores=6, prune=False).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_sparse_vector_validation(built_index):
    with pytest.raises(ValueError):
        built_index.sparse_vector({})
    with pytest.raises(ValueError):
        built_index.sparse_vector({"the": -1.0})
    with pytest.raises(ValueError):
        built_index.sparse_vector({"the and": 1.0})  # two tokens
    # unknown term: empty result, no throw
    assert built_index.sparse_vector({"zzzzunknownzzz": 1.0}).count() == 0


def test_hybrid_linear_minmax(built_index, spark, src, oracle):
    # vector leg: one-hot embeddings so cosine is deterministic
    import numpy as np

    n = len(src)
    rows = [(int(i), [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = built_index.hybrid_linear(
        "the and", [1.0, 0.0], emb, k=10, window=50,
        lex_weight=0.7, vec_weight=0.3,
    ).toPandas()
    # recompute: lexical leg = rounded BM25 top-50 minmax; vector leg =
    # cosine 1.0 for even ids, 0.0 for odd -> window keeps 50 even ids
    # (all cosine 1.0 -> ties by id) and their norm is 1.0 (max==min)
    lex = built_index.topk("the and", k=50, round_scores=6).toPandas()
    lo, hi = lex["score"].min(), lex["score"].max()
    ln = {
        int(d): (1.0 if hi == lo else (s - lo) / (hi - lo))
        for d, s in zip(lex["doc_id"], lex["score"])
    }
    vn = {i: 1.0 for i in range(n) if i % 2 == 0}
    vn = dict(sorted(vn.items())[:50])
    want = {}
    for d in set(ln) | set(vn):
        want[d] = round(0.7 * ln.get(d, 0.0) + 0.3 * vn.get(d, 0.0), 6)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in ranked]
    for g, (_, w) in zip(got["score"], ranked):
        assert abs(g - w) < 1e-9


def test_stratified_sample_exact_membership(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = stratified_sample(
        df, "s", {"a": 1.0, "b": 0.5}, "id", default_rate=0.0
    ).toPandas()
    want = set()
    for i, s in rows:
        h = (i % _P) * _A % _P
        thr = {"a": int(1.0 * _P), "b": int(0.5 * _P)}.get(s, 0)
        if h < thr:
            want.add(i)
    assert set(got["id"]) == want
    # every 'a' kept, no 'c' kept, 'b' is a strict subset
    assert set(got[got["s"] == "a"]["id"]) == {i for i in range(300) if i % 3 == 0}
    assert (got["s"] == "c").sum() == 0
    bs = (got["s"] == "b").sum()
    assert 0 < bs < 100
    with pytest.raises(ValueError):
        stratified_sample(df, "s", {"a": 1.5}, "id")
    with pytest.raises(ValueError):
        stratified_sample(df, "s", {}, "id", default_rate=-0.1)


def test_stratified_sample_deterministic(spark):
    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    a = set(stratified_sample(df, "s", {"x": 0.3}, "id").toPandas()["id"])
    b = set(stratified_sample(df, "s", {"x": 0.3}, "id").toPandas()["id"])
    assert a == b  # no RNG: identical across runs


def test_pack_chunks(spark):
    rows = [
        (0, "s1", 300), (1, "s1", 300), (2, "s1", 300),
        (3, "s2", 600), (4, "s2", 10),
    ]
    df = spark.createDataFrame(rows, "id long, stream string, n long")
    got = pack_chunks(df, "id", "n", budget=512, stream_col="stream").toPandas()
    r = {int(row["id"]): (int(row["offset"]), int(row["chunk_id"]))
         for _, row in got.iterrows()}
    # s1: offsets 0, 300, 600 -> chunks 0, 0, 1; s2: offsets 0, 600 -> 0, 1
    assert r == {0: (0, 0), 1: (300, 0), 2: (600, 1), 3: (0, 0), 4: (600, 1)}
    assert list(got.columns) == ["id", "stream", "n_tokens", "offset", "chunk_id"]
    with pytest.raises(ValueError):
        pack_chunks(df, "id", "n", budget=0)


def test_pack_chunks_single_stream(spark):
    df = spark.createDataFrame([(i, 100) for i in range(10)], "id long, n long")
    got = pack_chunks(df, "id", "n", budget=250).toPandas()
    assert list(got["chunk_id"]) == [math.floor(i * 100 / 250) for i in range(10)]


def test_shuffle_split_deterministic_and_disjoint(spark):
    import hashlib

    from dart_importer_spark.operators.sampling import shuffle_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = shuffle_split(df, w, id_col="doc_id").toPandas()
    # engine-portable: python recomputes identical keys and assignments
    # via the exported canonical boundary recipe (int(0.95 * 2**128)
    # computed directly would differ in the low bits — the helper IS the
    # contract)
    from dart_importer_spark.operators.sampling import split_bounds

    b1, b2 = split_bounds(w)
    for r in out.itertuples():
        key = hashlib.md5(f"epoch0:{r.doc_id}".encode()).hexdigest()
        assert key == r.shuffle_key
        want = "train" if key < b1 else ("val" if key < b2 else "test")
        assert want == r.split
    # split sizes near the weights; every row in exactly one split
    sizes = out.groupby("split").size()
    assert abs(sizes["train"] / 2000 - 0.9) < 0.03
    assert sizes.sum() == 2000
    # new seed permutes order but keeps corpus identical
    out2 = shuffle_split(df, w, id_col="doc_id", seed="epoch1").toPandas()
    assert set(out2.doc_id) == set(out.doc_id)
    assert list(out2.sort_values("shuffle_key").doc_id) != list(
        out.sort_values("shuffle_key").doc_id
    )


def test_shuffle_split_stable_under_append(spark):
    from dart_importer_spark.operators.sampling import shuffle_split

    w = {"train": 0.8, "val": 0.2}
    old = shuffle_split(
        spark.range(500).withColumnRenamed("id", "doc_id"), w
    ).toPandas()
    grown = shuffle_split(
        spark.range(800).withColumnRenamed("id", "doc_id"), w
    ).toPandas()
    merged = old.merge(grown, on="doc_id", suffixes=("_old", "_new"))
    assert (merged.split_old == merged.split_new).all()


def test_shuffle_split_no_exchange(spark):
    from dart_importer_spark.operators.sampling import shuffle_split

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        shuffle_split(df, {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_shuffle_split_validates_weights(spark):
    import pytest as _pt

    from dart_importer_spark.operators.sampling import (
        shuffle_split, split_bounds,
    )

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with _pt.raises(ValueError, match="> 0"):
        shuffle_split(df, {"train": 1.0, "bad": -0.2})
    with _pt.raises(ValueError, match="> 0"):
        shuffle_split(df, {"train": 0.0})
    # float-rounding a cum fraction to >= 1.0 must not grow the bound to
    # 33 hex chars (which would lexically dwarf every md5 key)
    bs = split_bounds({"a": 1.0, "b": 5e-17})
    assert all(len(b) == 32 for b in bs)


def test_temperature_rates_t1_and_saturation():
    from dart_importer_spark.operators.sampling import temperature_rates

    counts = {"a": 800, "b": 150, "c": 50}
    # T=1: natural distribution -> uniform keep rate target/N everywhere
    r = temperature_rates(counts, 1.0, 500)
    for s in counts:
        assert r[s] == pytest.approx(0.5)
    # high T flattens: the small stratum's rate rises toward saturation
    r2 = temperature_rates(counts, 100.0, 500)
    assert r2["c"] > r2["a"]
    # saturation + redistribution: uniform q over 3 strata wants ~167 each,
    # c has only 50 -> c pinned at 1.0, shortfall redistributed
    r3 = temperature_rates(counts, 1e9, 500)
    assert r3["c"] == 1.0
    kept = sum(r3[s] * counts[s] for s in counts)
    assert kept == pytest.approx(500, rel=1e-9)
    with pytest.raises(ValueError, match="temperature"):
        temperature_rates(counts, 0.0, 10)


def test_temperature_mix_exact_membership(spark):
    from dart_importer_spark.operators.sampling import (
        _A, _P, temperature_mix, temperature_rates,
    )

    rows = [(i, "a" if i % 10 < 7 else ("b" if i % 10 < 9 else "c"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, s string")
    counts = {"a": 700, "b": 200, "c": 100}
    got = {r["id"] for r in temperature_mix(df, "s", "id", 0.5, 400).collect()}
    rates = temperature_rates(counts, 0.5, 400)
    want = {
        i for i, s in rows
        if (i % _P) * _A % _P < int(rates[s] * _P)
    }
    assert got == want and len(got) > 0
    # T<1 sharpens toward the big stratum: 'a' dominates the sample
    frac_a = sum(1 for i in got if i % 10 < 7) / len(got)
    assert frac_a > 0.75


def test_chunk_text_windows(spark):
    from dart_importer_spark.operators.sampling import chunk_text

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, words), (1, "a b c"), (2, "   "), (3, "solo")],
        "id long, text string",
    )
    out = chunk_text(df, "id", "text", size=4, overlap=1).toPandas()
    d0 = out[out["id"] == 0].sort_values("chunk_id")
    # stride 3: starts 0,3,6 -> windows [0:4],[3:7],[6:10]; the window at
    # 6 reaches the end, so no degenerate overlap-only tail is emitted
    assert list(d0["chunk"]) == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert list(d0["n_tokens"]) == [4, 4, 4]
    # short doc -> one chunk; whitespace-only doc -> no rows
    assert list(out[out["id"] == 1]["chunk"]) == ["a b c"]
    assert (out["id"] == 2).sum() == 0
    assert list(out[out["id"] == 3]["chunk"]) == ["solo"]
    # every consecutive pair shares exactly `overlap` tokens
    rows = list(d0["chunk"])
    for a, b in zip(rows, rows[1:]):
        assert a.split()[-1:] == b.split()[:1]
    import pytest as _pt
    with _pt.raises(ValueError, match="overlap"):
        chunk_text(df, "id", "text", size=4, overlap=4)


def test_temperature_mix_null_strata_refused(spark):
    from dart_importer_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(0, "en"), (1, None), (2, "fr")], "doc_id long, lang string"
    )
    with pytest.raises(ValueError, match="contains NULLs"):
        temperature_mix(df, "lang", "doc_id", 1.0, 2)
