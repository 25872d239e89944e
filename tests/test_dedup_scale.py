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
