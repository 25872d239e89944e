"""Late-interaction (rank_vectors / maxSimDotProduct) operator tests on
planted multi-vector fixtures — hand-computed expectations, determinism
under repartition, and the no-Python-UDF plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators import similarity


@pytest.fixture(scope="module")
def chunk_rows(spark):
    # (doc, chunk_ord, vec) — doc 0 and doc 1 each carry two chunk
    # vectors; doc 2 one vector orthogonal to both queries
    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (0, 1, [0.0, 1.0, 0.0]),
        (1, 0, [0.5, 0.5, 0.0]),
        (1, 1, [0.0, 0.0, 1.0]),
        (2, 0, [0.0, 0.0, -1.0]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, ord int, vec array<float>"
    )


def test_fold_vectors_deterministic_order(spark, chunk_rows):
    # the fold must order chunks by ord regardless of partitioning
    for parts in (1, 7):
        out = similarity.fold_vectors(
            chunk_rows.repartition(parts), "doc_id", "vec", "ord"
        )
        row = {r["doc_id"]: r["vecs"] for r in out.collect()}
        assert [list(v) for v in row[0]] == [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        assert [list(v) for v in row[1]] == [[0.5, 0.5, 0.0], [0.0, 0.0, 1.0]]


def test_max_sim_hand_computed(spark, chunk_rows):
    docs = similarity.fold_vectors(chunk_rows, "doc_id", "vec", "ord")
    # queries q1=[1,0,0], q2=[0,0,1]:
    #   doc0: max(1, 0) + max(0, 0)     = 1.0
    #   doc1: max(.5, 0) + max(0, 1)    = 1.5
    #   doc2: max(0) + max(-1)          = -1.0
    out = similarity.max_sim_topk(
        docs, [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], k=10
    )
    got = [(r["doc_id"], r["score"]) for r in out.collect()]
    assert got == [(1, 1.5), (0, 1.0), (2, -1.0)]


def test_max_sim_excludes_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, [[1.0, 0.0]]), (1, [])],
        "doc_id long, vecs array<array<float>>",
    )
    out = similarity.max_sim_topk(docs, [[1.0, 0.0]], k=10)
    assert [r["doc_id"] for r in out.collect()] == [0]


def test_max_sim_requires_query_vectors():
    with pytest.raises(ValueError):
        similarity.max_sim_dot("vecs", [])


def test_max_sim_plan_jvm_only(spark, chunk_rows):
    # scoring must stay in the JVM (no BatchEvalPython) and reach the
    # top-k as a TakeOrderedAndProject
    docs = similarity.fold_vectors(chunk_rows, "doc_id", "vec", "ord")
    out = similarity.max_sim_topk(docs, [[1.0, 0.0, 0.0]], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


@pytest.fixture(scope="module")
def chunk_corpus(spark):
    # 12 docs x 5 chunks of dim 8, deterministic
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8)).astype("float32")
    rows = [(i, int(i // 5), [float(x) for x in vecs[i]]) for i in range(60)]
    return spark.createDataFrame(
        rows, "vec_id long, doc_id long, embedding array<float>"
    )


def test_max_sim_ann_full_probe_exact(spark, chunk_corpus):
    # nprobe = n_lists and num_candidates >= n_chunks => candidate
    # generation is lossless, so the ANN path must equal brute maxSim
    import numpy as np

    rng = np.random.default_rng(11)
    qvecs = [[float(x) for x in rng.standard_normal(8)] for _ in range(3)]
    ivf = similarity.IvfAnnIndex(
        chunk_corpus, id_col="vec_id", vec_col="embedding", n_lists=4
    )
    docs = similarity.fold_vectors(
        chunk_corpus, "doc_id", "embedding", "vec_id"
    )
    brute = [
        (r["doc_id"], round(r["score"], 9))
        for r in similarity.max_sim_topk(docs, qvecs, k=5).collect()
    ]
    ann = [
        (r["doc_id"], round(r["score"], 9))
        for r in similarity.max_sim_ann(
            ivf,
            chunk_corpus.select("vec_id", "doc_id"),
            docs,
            qvecs,
            k=5,
            nprobe=4,
            num_candidates=60,
        ).collect()
    ]
    assert ann == brute


def test_max_sim_ann_partial_probe_scores_exact(spark, chunk_corpus):
    # a lossy probe may MISS docs but must never misSCORE one: every
    # returned (doc, score) matches the brute-force score for that doc
    import numpy as np

    rng = np.random.default_rng(13)
    qvecs = [[float(x) for x in rng.standard_normal(8)] for _ in range(2)]
    ivf = similarity.IvfAnnIndex(
        chunk_corpus, id_col="vec_id", vec_col="embedding", n_lists=4
    )
    docs = similarity.fold_vectors(
        chunk_corpus, "doc_id", "embedding", "vec_id"
    )
    brute = {
        r["doc_id"]: round(r["score"], 9)
        for r in similarity.max_sim_topk(docs, qvecs, k=12).collect()
    }
    ann = similarity.max_sim_ann(
        ivf,
        chunk_corpus.select("vec_id", "doc_id"),
        docs,
        qvecs,
        k=5,
        nprobe=1,
        num_candidates=5,
    ).collect()
    assert 0 < len(ann) <= 5
    for r in ann:
        assert round(r["score"], 9) == brute[r["doc_id"]]


def test_max_sim_dim_mismatch_raises(spark):
    docs = spark.createDataFrame(
        [(0, [[1.0, 0.0, 0.0]])], "doc_id long, vecs array<array<float>>"
    )
    with pytest.raises(Exception, match="dim"):
        similarity.max_sim_topk(docs, [[1.0, 0.0]], k=1).collect()
    with pytest.raises(ValueError, match="mixed dims"):
        similarity.max_sim_dot("vecs", [[1.0], [1.0, 2.0]])


def test_max_sim_ann_custom_id_col(spark, chunk_corpus):
    # regression: topk_batch's fixed (q_id, vec_id, ...) output schema
    # must be realiased to the index's id_col before the chunk_doc join
    renamed = chunk_corpus.withColumnRenamed("vec_id", "chunk_pk")
    ivf = similarity.IvfAnnIndex(
        renamed, id_col="chunk_pk", vec_col="embedding", n_lists=4
    )
    docs = similarity.fold_vectors(
        chunk_corpus, "doc_id", "embedding", "vec_id"
    )
    qvecs = [[1.0] + [0.0] * 7]
    out = similarity.max_sim_ann(
        ivf, renamed.select("chunk_pk", "doc_id"), docs, qvecs,
        k=3, nprobe=4, num_candidates=60,
    )
    brute = similarity.max_sim_topk(docs, qvecs, k=3)
    assert [(r["doc_id"], round(r["score"], 9)) for r in out.collect()] == \
        [(r["doc_id"], round(r["score"], 9)) for r in brute.collect()]


def test_max_sim_scan_prunes_columns(spark, tmp_path, chunk_corpus):
    # at 100 TB the chunk table carries payload columns the scorer must
    # not read: ReadSchema on the parquet scan stays (id, doc, vec) only
    p = str(tmp_path / "chunks")
    chunk_corpus.withColumn("payload", F.lit("x" * 100)).write.parquet(p)
    emb = spark.read.parquet(p)
    docs = similarity.fold_vectors(emb, "doc_id", "embedding", "vec_id")
    out = similarity.max_sim_topk(docs, [[0.0] * 8], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    rs = _re.search(r"ReadSchema: ([^\n]+)", plan)
    assert rs and "payload" not in rs.group(1)
