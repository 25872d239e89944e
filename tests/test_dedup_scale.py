"""Scale-shape guarantees of the dedup operators (round-3 VERDICT items):
block-permutation SimHash pairing (wide join keys, still complete) and
no-silent-drop reporting for oversized LSH buckets."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators import dedup


def _brute_pairs(ids, hashes, h):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= h:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


@pytest.fixture(scope="module")
def sim_df(spark):
    """Adversarial simhash table: every hash shares its low 15 bits (the old
    4-chunk scheme's entire first join key), high 45 bits pseudo-random."""
    rng = np.random.default_rng(7)
    shared = 0x5A3C  # 15 bits shared by every doc
    hashes = [
        int((int(rng.integers(0, 1 << 45)) << 15) | shared) for _ in range(60)
    ]
    # plant two true near-dup pairs (Hamming 1 and 3)
    hashes[50] = hashes[10] ^ (1 << 20)
    hashes[51] = hashes[11] ^ (1 << 21) ^ (1 << 33) ^ (1 << 44)
    pdf = [(i, h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(pdf, "doc_id long, simhash long")
    return df, {i: h for i, h in pdf}


def test_simhash_block_permutations_complete(spark, sim_df):
    df, hmap = sim_df
    ids = sorted(hmap)
    want = _brute_pairs(ids, [hmap[i] for i in ids], 3)
    for n_chunks in (4, 5, 6):
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(
                df, max_hamming=3, n_chunks=n_chunks
            ).collect()
        }
        assert got == want, n_chunks
    assert len(want) >= 2  # the planted pairs are found


def test_simhash_wide_keys_bound_candidates(spark, sim_df):
    """The old 15-bit chunk keys bucket EVERYTHING on this corpus (shared
    low bits) -> quadratic candidates; the default 30-bit subset keys keep
    the candidate set near the true pair count."""
    df, hmap = sim_df
    n = len(hmap)
    narrow = dedup.simhash_candidate_pairs(df, max_hamming=3, n_chunks=4).count()
    wide = dedup.simhash_candidate_pairs(df, max_hamming=3).count()  # default 6
    assert narrow >= n * (n - 1) // 2  # chunk 0 collides on every pair
    assert wide < narrow / 10, (wide, narrow)


def test_simhash_chunk_validation(spark, sim_df):
    df, _ = sim_df
    with pytest.raises(ValueError, match="n_chunks"):
        dedup.simhash_candidate_pairs(df, max_hamming=3, n_chunks=3)


def test_minhash_lsh_reports_oversized_buckets(spark):
    rows = [(i, "common boilerplate text shared by every doc") for i in range(80)]
    rows += [(100, "a unique pair of documents here now one"),
             (101, "a unique pair of documents here now one")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs, n_perm=16, shingle_n=3)
    metrics: dict = {}
    pairs = dedup.minhash_lsh_pairs(
        sigs, bands=4, max_bucket=64, metrics_out=metrics
    )
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (100, 101) in got
    over = metrics["oversized_buckets"].collect()
    assert over and all(r["n"] == 80 for r in over)  # the boilerplate cluster
    dropped = {r["doc_id"] for r in metrics["dropped_ids"].collect()}
    assert dropped == set(range(80))


def test_embedding_near_dups_reports_oversized_buckets(spark):
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(20)]  # one giant bucket
    rows += [(100, [0.0, 1.0, 0.01]), (101, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    metrics: dict = {}
    pairs = dedup.embedding_near_dups(
        emb, n_planes=8, threshold=0.95, max_bucket=10, metrics_out=metrics
    )
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (100, 101) in got
    dropped = {r["vec_id"] for r in metrics["dropped_ids"].collect()}
    assert dropped == set(range(20))


def test_ngram_jaccard_pairs_exact(spark):
    rows = [
        (1, "a b c d e f"),          # shingles: abc bcd cde def (4)
        (2, "a b c d e f g"),        # + efg (5); inter=4, union=5 -> 0.8
        (3, "x y z w"),              # xyz yzw (2)
        (4, "p q"),                  # <3 tokens -> single whole-text shingle
        (5, "p q"),                  # identical -> jaccard 1.0 with 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): round(r["jaccard"], 6)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == {(1, 2): 0.8, (4, 5): 1.0}


def test_ngram_jaccard_cap_is_lower_bound(spark):
    # doc 1/2 share ONLY the hot shingle "a b c" (df=3 with doc 3's copies)
    rows = [
        (1, "a b c q1 q2"),
        (2, "a b c r1 r2"),
        (3, "a b c s1 s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["a"], r["b"]) for r in
            dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert full == {(1, 2), (1, 3), (2, 3)}
    metrics: dict = {}
    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.1, max_shingle_df=2, metrics_out=metrics
    )
    # the only shared shingle has df=3 > cap -> no candidates, and the
    # dropped shingle is reported, never silently lost
    assert capped.count() == 0
    hot = {r["sh"] for r in metrics["capped_shingles"].collect()}
    assert hot == {"a b c"}


def test_brute_force_cosine_pairs_matches_numpy(spark):
    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[41] = vecs[40] + 0.01  # planted near-dup
    vecs[41] /= np.linalg.norm(vecs[41])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    thr = 0.35
    got = {
        (r["a"], r["b"]): round(r["cosine"], 9)
        for r in similarity.brute_force_cosine_pairs(
            emb, threshold=thr, n_blocks=5
        ).collect()
    }
    cos = vecs @ vecs.T
    want = {
        (i, j): round(cos[i, j], 9)
        for i in range(60)
        for j in range(i + 1, 60)
        if cos[i, j] >= thr
    }
    assert got == want
    assert (40, 41) in got
    with pytest.raises(ValueError):
        similarity.brute_force_cosine_pairs(emb, threshold=0.0)


def test_embedding_near_dups_multi_table_recall(spark):
    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, v.tolist()))
        w = v + rng.standard_normal(32) * 0.005
        w /= np.linalg.norm(w)
        rows.append((i * 2 + 1, w.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planted = {(i * 2, i * 2 + 1) for i in range(40)}

    def recall(n_tables):
        nd = dedup.embedding_near_dups(
            emb, n_planes=10, threshold=0.99, seed=42, n_tables=n_tables
        )
        got = {(r["a"], r["b"]) for r in nd.collect()}
        assert got <= planted  # verify step: precision is always exact
        return len(got & planted) / len(planted)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1  # more tables never lose pairs
    assert r4 >= 0.95  # 4 tables x 10 planes recovers (nearly) all planted


def test_ngram_jaccard_cap_never_inflates(spark):
    """The review counterexample: sizes must come from PRE-cap sets, or a
    capped pair's reported jaccard can exceed the true value. A={h1,h2,x},
    B={x,y}: true J = 1/4; with post-cap sizes the buggy value was
    1/(1+2-1) = 0.5 — a false positive at threshold 0.5."""
    rows = [
        (1, "h1 h2 x"),
        (2, "x y"),
        (3, "h1 h2 q1"),
        (4, "h1 h2 q2"),
        (5, "h1 h2 q3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.ngram_jaccard_pairs(
        docs, threshold=0.5, shingle_n=1, max_shingle_df=3
    ).collect()
    assert all((r["a"], r["b"]) != (1, 2) for r in got)
    # and every reported value is a true lower bound
    low = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.01, shingle_n=1, max_shingle_df=3
        ).collect()
    }
    true = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.01, shingle_n=1
        ).collect()
    }
    for pair, v in low.items():
        assert v <= true[pair] + 1e-12


# ---------------------------------------------------------------- clusters


def test_dedup_clusters_merges_chains(spark):
    """a~b, b~c, c~d must land in ONE cluster even though a~c, a~d, b~d
    were never emitted as pairs — the transitivity the pair operators
    themselves cannot express."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a long, b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_dedup_clusters_long_chain_and_reverse_ids(spark):
    """A 40-node path with ids DESCENDING along the chain (worst case for
    min-propagation: the min label must travel the full diameter) still
    converges inside max_iter thanks to pointer jumping, and every node
    gets the global min id."""
    n = 40
    pairs = spark.createDataFrame(
        [(n - i, n - i - 1) for i in range(n - 1)], "a long, b long"
    )
    rows = dedup.dedup_clusters(pairs, max_iter=12).collect()
    assert {r["cluster_id"] for r in rows} == {1}
    assert len(rows) == n


def test_dedup_clusters_singletons_via_ids(spark):
    pairs = spark.createDataFrame([(5, 6)], "a long, b long")
    ids = spark.createDataFrame([(5,), (6,), (7,), (8,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(pairs, ids=ids).collect()
    }
    assert got == {5: 5, 6: 5, 7: 7, 8: 8}
    # empty pair set: everything is a singleton
    empty = spark.createDataFrame([], "a long, b long")
    got2 = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(empty, ids=ids).collect()
    }
    assert got2 == {5: 5, 6: 6, 7: 7, 8: 8}


def test_keep_canonical_prefers_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text here"), (3, "midlen text"),
         (4, "same len"), (5, "same len"), (9, "untouched singleton")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    clusters = dedup.dedup_clusters(pairs)
    kept = dedup.keep_canonical(
        docs, clusters, prefer=F.length("text")
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4, 9]
    # prefer=None: min id wins
    kept2 = dedup.keep_canonical(docs, clusters)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 4, 9]
    # original columns come back untouched
    assert kept.columns == docs.columns


def test_dedup_clusters_reports_convergence(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    m = {}
    dedup.dedup_clusters(pairs, metrics_out=m).collect()
    assert m["converged"] and 1 <= m["rounds"] <= 4
    # max_iter too small for the chain: warned + reported, never silent
    n = 24
    chain = spark.createDataFrame(
        [(n - i, n - i - 1) for i in range(n - 1)], "a long, b long"
    )
    m2 = {}
    with pytest.warns(RuntimeWarning, match="under-merged"):
        dedup.dedup_clusters(chain, max_iter=1, metrics_out=m2).collect()
    assert not m2["converged"] and m2["rounds"] == 1


def test_minhash_incremental_pairs(spark):
    """New-batch-vs-corpus banding join: finds the copy, never pairs the
    corpus with itself, and reports (not silently drops) hot corpus
    buckets."""
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(20)]
        + [(50, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1050, "the quick brown fox jumps over the lazy dog"),  # copy of 50
         (1051, "completely unrelated text with novel words only")],
        "doc_id long, text string",
    )
    cs = dedup.minhash_signatures(corpus, n_perm=32)
    ns = dedup.minhash_signatures(new, n_perm=32)
    cand = dedup.minhash_lsh_pairs_incremental(ns, cs, bands=8)
    rows = {(r["a"], r["b"]) for r in cand.collect()}
    assert (50, 1050) in rows
    # only cross-boundary pairs: a from corpus, b from new
    assert all(a < 1000 <= b for a, b in rows)
    ver = dedup.jaccard_verify(
        corpus.unionByName(new), cand, threshold=0.999999
    )
    assert {(r["a"], r["b"]) for r in ver.collect()} == {(50, 1050)}
    # max_bucket=1: every corpus bucket the 20 near-identical docs share
    # is oversized -> excluded but REPORTED
    m = {}
    cand2 = dedup.minhash_lsh_pairs_incremental(
        ns, cs, bands=8, max_bucket=1, metrics_out=m
    )
    cand2.collect()
    assert m["oversized_buckets"].count() > 0
    dropped = {r["doc_id"] for r in m["dropped_ids"].collect()}
    assert dropped and dropped <= set(range(20)) | {50}
