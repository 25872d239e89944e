"""Unit tests for the training-data operators (dedup / similarity / text /
multimodal) on small planted fixtures — hermetic, driver-side data."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators import dedup, multimodal, similarity
from dart_importer_spark.operators import text as textops

BASE = (
    "spark builds distributed indexes over large transcript tables with "
    "deterministic sharding and careful shuffle placement for scale"
)
NEAR = BASE.replace("careful", "cautious")  # one token differs
OTHER = "an entirely different document about cooking pasta with tomatoes and basil"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact dup of 0
        (2, NEAR),          # near dup of 0
        (3, OTHER),
        (4, "short text"),
        (5, "der hund und die katze ist nicht ein problem zu haben mit"),
        (6, "the cat and the dog of it is you that in a house"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["rep_id"]: r["n_dups"] for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert sum(out.values()) == 7


def test_minhash_lsh_jaccard_pipeline(docs):
    sigs = dedup.minhash_signatures(docs, n_perm=32)
    srows = {r["doc_id"]: tuple(r["sig"]) for r in sigs.collect()}
    assert srows[0] == srows[1]  # identical text -> identical signature
    pairs = dedup.minhash_lsh_pairs(sigs, bands=8)
    cand = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 1) in cand
    assert (0, 2) in cand or (1, 2) in cand  # near dup shares >=1 band
    verified = dedup.jaccard_verify(docs, pairs, threshold=0.5)
    v = {(r["a"], r["b"]): r["jaccard"] for r in verified.collect()}
    assert v[(0, 1)] == 1.0
    near_key = (0, 2) if (0, 2) in v else (1, 2)
    assert 0.5 <= v[near_key] < 1.0
    assert not any(3 in k or 4 in k for k in v)


def test_simhash_near_dups(docs):
    sim = dedup.simhash(docs)
    h = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert h[0] == h[1]
    ham02 = bin(h[0] ^ h[2]).count("1")
    ham03 = bin(h[0] ^ h[3]).count("1")
    assert ham02 < ham03  # near dup closer than unrelated
    pairs = dedup.simhash_near_dups(sim, max_hamming=max(ham02, 1))
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert (0, 2) in got


def test_embedding_near_dups_and_ann(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((12, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, (v / np.linalg.norm(v)).astype("float32").tolist()))
        w = v + rng.standard_normal(16) * 0.01  # planted near-dup partner
        rows.append((i * 2 + 1, (w / np.linalg.norm(w)).astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    nd = dedup.embedding_near_dups(emb, n_planes=12, threshold=0.99)
    got = {(r["a"], r["b"]) for r in nd.collect()}
    planted = {(i * 2, i * 2 + 1) for i in range(12)}
    assert planted & got  # hyperplane LSH finds (most) planted pairs
    assert got <= planted | {(a, b) for a in range(24) for b in range(24)}

    # ANN vs brute force on a planted query
    q = rows[0][1]
    bf = [r["vec_id"] for r in similarity.brute_force_cosine_topk(emb, q, k=3).collect()]
    ann = similarity.LshAnnIndex(emb, n_tables=8, n_planes=8, persist=False)
    got_ann = [r["vec_id"] for r in ann.topk(q, k=3, multiprobe=1).collect()]
    assert got_ann == bf


def test_ivf_ann_full_probe_is_exact(spark, tmp_path):
    """IVF with nprobe == n_lists degenerates to brute force (every list
    scanned); save/load answers identically; low nprobe scans fewer
    candidates than the corpus."""
    rng = np.random.default_rng(23)
    rows = [
        (i, (v / np.linalg.norm(v)).astype("float32").tolist())
        for i, v in enumerate(rng.standard_normal((96, 16)))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivf = similarity.IvfAnnIndex(emb, n_lists=6, seed=1, persist=False)
    q = rows[5][1]
    bf = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in similarity.brute_force_cosine_topk(emb, q, k=5).collect()
    ]
    full = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf.topk(q, k=5, nprobe=6).collect()
    ]
    assert full == bf
    path = str(tmp_path / "ivf_idx")
    ivf.save(path)
    loaded = similarity.IvfAnnIndex.load(spark, path)
    assert loaded.n_lists == 6 and loaded.centroids.shape == (6, 16)
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf.topk(q, k=5, nprobe=3).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in loaded.topk(q, k=5, nprobe=3).collect()]
    assert a == b
    # the query's own vector lives in the first-probed list -> always found
    assert a[0][0] == 5
    # probing is a real subset: candidate count < corpus size
    n_cand = loaded.table.filter(
        F.col("list_id").isin(loaded._probe_lists(q, 2))
    ).count()
    assert n_cand < 96


def test_langid(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in textops.with_langid(docs).collect()}
    assert out[6] == "en"
    assert out[5] == "de"
    assert out[4] == "und"


def test_quality_and_token_count(docs):
    out = textops.with_token_count(docs).filter(F.col("doc_id") == 4).first()
    assert out["n_tokens"] == 2
    q = textops.with_quality(docs).filter(F.col("doc_id") == 6).first()
    assert q["stopword_hits"] >= 5
    assert 0 < q["alnum_ratio"] <= 1


def test_fingerprint_similarity(docs):
    fp = {r["doc_id"]: tuple(r["fingerprint"]) for r in textops.with_fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    shared_near = len(set(fp[0]) & set(fp[2]))
    shared_far = len(set(fp[0]) & set(fp[3]))
    assert shared_near > shared_far


def test_multimodal_features_and_frames(spark):
    media = multimodal.fake_media_df(spark, n=30)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 30
    payloads = {r["media_id"]: r["payload"] for r in media.collect()}
    for r in feats:
        want = hashlib.sha256(bytes(payloads[r["media_id"]])).digest()[:16]
        got = [round(x * 255) for x in r["feature"]]
        assert got == list(want)
        assert r["n_bytes"] == len(payloads[r["media_id"]])

    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert {r["media_id"] for r in rows} == set(durations)
    for r in rows:
        d = durations[r["media_id"]]
        assert r["count"] == (max(d - 1, 0) // 1000) + 1


def test_ann_save_load_roundtrip(spark, tmp_path):
    """Persisted signature table must answer identically to the in-memory
    index — and without recomputing signatures (no vec scan at load)."""
    rng = np.random.default_rng(11)
    rows = [
        (i, (v / np.linalg.norm(v)).astype("float32").tolist())
        for i, v in enumerate(rng.standard_normal((64, 16)))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ann = similarity.LshAnnIndex(emb, n_tables=6, n_planes=6, persist=False)
    path = str(tmp_path / "ann_idx")
    ann.save(path)
    loaded = similarity.LshAnnIndex.load(spark, path)
    assert (loaded.n_tables, loaded.n_planes, loaded.dim) == (6, 6, 16)
    q = rows[3][1]
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in ann.topk(q, k=5).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in loaded.topk(q, k=5).collect()]
    assert a == b


def test_filtered_knn_prefilter_semantics(spark):
    """ES 8 filtered-kNN: the allowed set filters BEFORE rerank, so top-k
    always comes from allowed ids (a post-filter could come up short)."""
    rng = np.random.default_rng(31)
    rows = [
        (i, (v / np.linalg.norm(v)).astype("float32").tolist())
        for i, v in enumerate(rng.standard_normal((64, 16)))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    allowed = spark.createDataFrame(
        [(i,) for i in range(0, 64, 2)], "vec_id long"
    )
    q = rows[4][1]
    exact = [
        r["vec_id"]
        for r in similarity.brute_force_cosine_topk(
            emb.join(allowed, "vec_id", "left_semi"), q, k=5
        ).collect()
    ]
    lsh = similarity.LshAnnIndex(emb, n_tables=8, n_planes=6, persist=False)
    got_lsh = [r["vec_id"] for r in lsh.topk(q, k=5, allowed=allowed).collect()]
    assert all(v % 2 == 0 for v in got_lsh)
    ivf = similarity.IvfAnnIndex(emb, n_lists=4, seed=3, persist=False)
    got_ivf = [
        r["vec_id"] for r in ivf.topk(q, k=5, nprobe=4, allowed=allowed).collect()
    ]
    # full probe + filter == exact filtered brute force
    assert got_ivf == exact
    assert all(v % 2 == 0 for v in got_ivf)


def test_percolate_reverse_search(spark):
    from dart_importer_spark.operators import percolate as pc

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta only here"), (2, "nothing rel")],
        "doc_id long, text string",
    )
    queries = {"qa": "alpha beta", "qb": "gamma", "qc": "zzz"}
    got = {
        (r["query_id"], r["doc_id"]): r["n_matched"]
        for r in pc.percolate(spark, queries, docs).collect()
    }
    assert got == {("qa", 0): 2, ("qa", 1): 1, ("qb", 0): 1}
    got_and = {
        (r["query_id"], r["doc_id"])
        for r in pc.percolate(spark, queries, docs, mode="and").collect()
    }
    assert got_and == {("qa", 0), ("qb", 0)}
    assert pc.percolate(spark, {}, docs).count() == 0
    with pytest.raises(ValueError):
        pc.percolate(spark, queries, docs, mode="xor")


def test_percolate_structured_clauses(spark):
    from dart_importer_spark.operators import percolate as pc

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),     # phrase 'alpha beta' present
            (1, "beta alpha gamma"),     # both terms, wrong order
            (2, "alpha beta noise bad"), # phrase present but excluded
            (3, "gamma delta epsilon"),  # no phrase terms
        ],
        "doc_id long, text string",
    )
    queries = {
        "q_phrase": {"phrase": "alpha beta", "must_not": ["bad"]},
        "q_must": {"must": ["gamma", "beta"]},
        "q_msm": {"should": ["alpha", "beta", "delta"],
                  "minimum_should_match": 2},
        "q_neg": {"must_not": ["alpha"]},
    }
    got = {
        (r["query_id"], r["doc_id"]): r["n_matched"]
        for r in pc.percolate(spark, queries, docs).collect()
    }
    assert {k for k in got if k[0] == "q_phrase"} == {("q_phrase", 0)}
    assert got[("q_phrase", 0)] == 0  # phrase-only match: no term tally
    assert {k for k in got if k[0] == "q_must"} == {("q_must", 0), ("q_must", 1)}
    assert got[("q_must", 0)] == 2
    # msm=2: docs 0/1 match alpha+beta; doc 2 matches alpha+beta; doc 3 only delta
    assert {k[1] for k in got if k[0] == "q_msm"} == {0, 1, 2}
    # pure-negative: every doc lacking 'alpha'
    assert {k[1] for k in got if k[0] == "q_neg"} == {3}


def test_percolate_must_with_optional_should(spark):
    from dart_importer_spark.operators import percolate as pc

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha zeta")], "doc_id long, text string"
    )
    # ES default: with must present, should is optional but still tallied
    got = {
        r["doc_id"]: r["n_matched"]
        for r in pc.percolate(
            spark, {"q": {"must": ["alpha"], "should": ["beta"]}}, docs
        ).collect()
    }
    assert got == {0: 2, 1: 1}


def test_percolate_validation(spark):
    from dart_importer_spark.operators import percolate as pc

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):  # msm beyond should count
        pc.percolate(spark, {"q": {"should": ["a"], "minimum_should_match": 2}}, docs)
    with pytest.raises(ValueError):  # match-everything rule
        pc.percolate(spark, {"q": {"should": ["a"], "minimum_should_match": 0}}, docs)
    with pytest.raises(ValueError):  # unknown clause key
        pc.percolate(spark, {"q": {"mustt": ["a"]}}, docs)
    with pytest.raises(ValueError):  # empty clause set
        pc.percolate(spark, {"q": {}}, docs)


def test_ivf_centroids_parquet_roundtrip_and_sampled_fit(spark, tmp_path):
    import os

    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(600)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # target = max(256*n_lists, train_target) = 512 < 600 rows -> the fit
    # must sample, not take the corpus
    ivf = similarity.IvfAnnIndex(
        emb, n_lists=2, seed=1, train_target=100, persist=False
    )
    assert ivf.train_fraction < 1.0
    path = str(tmp_path / "ivf_pq")
    ivf.save(path)
    # centroids live in a parquet table, not in meta.json
    assert os.path.isdir(os.path.join(path, "centroids"))
    import json

    with open(os.path.join(path, "meta.json")) as f:
        assert "centroids" not in json.load(f)
    loaded = similarity.IvfAnnIndex.load(spark, path)
    assert np.allclose(loaded.centroids, ivf.centroids)
    q = vecs[0][1]
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf.topk(q, k=5, nprobe=3).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in loaded.topk(q, k=5, nprobe=3).collect()]
    assert a == b


def test_ivf_distributed_centroid_ranking_matches_driver(spark, tmp_path):
    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(200)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    ivf = similarity.IvfAnnIndex(emb, n_lists=5, seed=2, persist=False)
    path = str(tmp_path / "ivf_dist")
    ivf.save(path)
    loaded = similarity.IvfAnnIndex.load(spark, path)
    q = vecs[3][1]
    driver_lists = loaded._probe_lists(q, 3)
    # force the big-quantizer path: drop the driver copy
    loaded.centroids = None
    assert loaded._probe_lists(q, 3) == driver_lists


def test_ivf_append_o_batch(spark, tmp_path):
    """IVF add: appended vectors land in their nearest existing list
    (quantizer frozen), full probe over the grown index equals brute
    force over the UNION, untouched list files are never rewritten, and
    the monotone-id contract is enforced."""
    import os

    rng = np.random.default_rng(31)
    mk = lambda i, v: (i, (v / np.linalg.norm(v)).astype("float32").tolist())
    rows = [mk(i, v) for i, v in enumerate(rng.standard_normal((60, 12)))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivf = similarity.IvfAnnIndex(emb, n_lists=5, seed=7, persist=False)
    path = str(tmp_path / "ivf_grow")
    ivf.save(path)
    loaded = similarity.IvfAnnIndex.load(spark, path)

    before = {
        d: sorted(os.listdir(os.path.join(path, "lists", d)))
        for d in os.listdir(os.path.join(path, "lists"))
        if d.startswith("list_id=")
    }
    new_rows = [mk(100 + i, v) for i, v in enumerate(rng.standard_normal((20, 12)))]
    new = spark.createDataFrame(new_rows, "vec_id long, embedding array<float>")
    m = loaded.append(new, path)
    assert m["appended"] == 20 and 1 <= m["lists_touched"] <= 5

    # untouched list dirs keep exactly their old files
    after = {
        d: sorted(os.listdir(os.path.join(path, "lists", d)))
        for d in os.listdir(os.path.join(path, "lists"))
        if d.startswith("list_id=")
    }
    untouched = [d for d in before if before[d] == after.get(d)]
    assert len(untouched) == 5 - m["lists_touched"]
    for d in before:  # append never deletes old files
        assert set(before[d]) <= set(after[d])

    both = emb.unionByName(new)
    q = new_rows[3][1]
    bf = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in similarity.brute_force_cosine_topk(both, q, k=7).collect()
    ]
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in loaded.topk(q, k=7, nprobe=5).collect()
    ]
    assert got == bf
    # a reload sees the appended rows too
    again = similarity.IvfAnnIndex.load(spark, path)
    assert again.table.count() == 80
    with pytest.raises(ValueError, match="monotone|> "):
        loaded.append(new, path)  # overlapping ids refused
    # empty batch is a no-op
    assert loaded.append(
        spark.createDataFrame([], "vec_id long, embedding array<float>"), path
    ) == {"appended": 0, "lists_touched": 0}


def test_ivf_append_distributed_assignment_matches_driver(spark, tmp_path):
    """append with centroids = None (big-quantizer regime) assigns via the
    crossJoin+window fallback — identical list choice to the in-memory
    Arrow matmul."""
    rng = np.random.default_rng(13)
    mk = lambda i, v: (i, (v / np.linalg.norm(v)).astype("float32").tolist())
    rows = [mk(i, v) for i, v in enumerate(rng.standard_normal((40, 8)))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    new_rows = [mk(200 + i, v) for i, v in enumerate(rng.standard_normal((10, 8)))]
    new = spark.createDataFrame(new_rows, "vec_id long, embedding array<float>")

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (p1, p2):
        similarity.IvfAnnIndex(emb, n_lists=4, seed=5, persist=False).save(p)
    mem = similarity.IvfAnnIndex.load(spark, p1)
    mem.append(new, p1)
    dist = similarity.IvfAnnIndex.load(spark, p2)
    dist.centroids = None  # force the distributed branch
    dist.append(new, p2)
    a = {(r["vec_id"], r["list_id"]) for r in
         spark.read.parquet(f"{p1}/lists").filter("vec_id >= 200").collect()}
    b = {(r["vec_id"], r["list_id"]) for r in
         spark.read.parquet(f"{p2}/lists").filter("vec_id >= 200").collect()}
    assert a == b and len(a) == 10


def test_ivf_sq8_quantized_probe(spark, tmp_path):
    """SQ8: full-probe + full-window topk_sq equals the exact float
    probe (quantization only ranks the rescore window, and the window
    here covers everything); save/load round-trips the quant table;
    unquantized indexes refuse topk_sq; codes are genuinely int8."""
    rng = np.random.default_rng(7)
    rows = [
        (i, (v / np.linalg.norm(v)).astype("float32").tolist())
        for i, v in enumerate(rng.standard_normal((80, 12)))
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivf = similarity.IvfAnnIndex(emb, n_lists=4, seed=3, persist=False)
    path = str(tmp_path / "sq_idx")
    ivf.save(path, quantize=True)
    q = rows[11][1]
    exact = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf.topk(q, k=5, nprobe=4).collect()
    ]
    sq = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf.topk_sq(q, k=5, nprobe=4, rescore_window=80).collect()
    ]
    assert sq == exact
    loaded = similarity.IvfAnnIndex.load(spark, path)
    sq2 = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in loaded.topk_sq(q, k=5, nprobe=4, rescore_window=80).collect()
    ]
    assert sq2 == exact
    # tight window still recalls well on this small corpus
    tight = {r["vec_id"] for r in loaded.topk_sq(q, k=5, nprobe=4).collect()}
    assert len(tight & {d for d, _ in exact}) >= 4
    codes = spark.read.parquet(f"{path}/lists_q")
    assert dict(codes.dtypes)["vec_q"] == "array<tinyint>"
    # an index never saved with quantize=True refuses the SQ probe
    ivf2 = similarity.IvfAnnIndex(emb, n_lists=4, seed=3, persist=False)
    import pytest as _pt
    with _pt.raises(ValueError):
        ivf2.topk_sq(q, k=5)


def test_unigram_lm_perplexity(spark):
    """Hand-computed add-α unigram LM: corpus 'a a b' + 'a c' gives
    counts a=3, b=1, c=1, total=5, V=3, denom = 5 + 0.5*4 = 7.
    p(a)=3.5/7=.5, p(b)=p(c)=1.5/7, p(OOV)=0.5/7. Zero-token docs
    produce no row."""
    import math

    from dart_importer_spark.operators.text import (
        fit_unigram_lm,
        perplexity_scores,
    )

    ref = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    lm = fit_unigram_lm(ref, alpha=0.5)
    assert (lm.total, lm.vocab, lm.denom) == (5, 3, 7.0)
    tgt = spark.createDataFrame(
        [(10, "a a"), (11, "a zzz"), (12, "???")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in perplexity_scores(tgt, lm).collect()}
    assert set(rows) == {10, 11}  # doc 12 tokenizes to nothing
    assert rows[10]["n_tokens"] == 2
    assert rows[10]["xent"] == pytest.approx(-math.log(0.5))
    assert rows[10]["ppl"] == pytest.approx(2.0)
    # doc 11: a (3.5/7) and OOV zzz (0.5/7)
    want = -(math.log(3.5 / 7) + math.log(0.5 / 7)) / 2
    assert rows[11]["xent"] == pytest.approx(want)
    assert rows[11]["ppl"] == pytest.approx(math.exp(want))
