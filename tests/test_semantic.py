"""semantic_text pipeline tests: deterministic feature-hash embeddings,
self-retrieval, lexical relevance ordering, pluggable embedder swap, and
the Arrow-batch (no row-wise Python) plan contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dart_importer_spark.operators import semantic


DOCS = [
    (0, "spark shuffles partitions across the cluster during wide joins"),
    (1, "tomato basil pasta simmers slowly on the stove with garlic"),
    (2, "partition pruning keeps parquet scans narrow in spark queries"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_embed_deterministic_across_layouts(spark, corpus):
    a = semantic.embed_chunks(
        corpus, "doc_id", "text", chunk_size=4, dim=16
    ).collect()
    b = semantic.embed_chunks(
        corpus.repartition(5), "doc_id", "text", chunk_size=4, dim=16
    ).collect()
    am = {(r["id"], r["chunk_id"]): list(r["vec"]) for r in a}
    bm = {(r["id"], r["chunk_id"]): list(r["vec"]) for r in b}
    assert am == bm
    # unit-normalized
    for v in am.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_semantic_self_and_lexical_retrieval(spark, corpus):
    ix = semantic.semantic_index(
        corpus, "doc_id", "text", chunk_size=4, dim=32
    )
    # self-retrieval: a doc's opening chunk embeds to an exact stored
    # vector -> best-chunk dot == 1
    hits = semantic.semantic_topk(
        ix, "spark shuffles partitions across", k=3, dim=32
    ).collect()
    assert hits[0]["id"] == 0
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-5)
    # lexical relevance: shared vocabulary ("partition", "spark") must
    # outrank the cooking doc
    hits = semantic.semantic_topk(
        ix, "spark partition tuning", k=3, dim=32
    ).collect()
    assert {hits[0]["id"], hits[1]["id"]} == {0, 2}
    assert hits[2]["id"] == 1


def test_set_embedder_swaps_endpoint(spark, corpus):
    def fake(texts: pd.Series) -> np.ndarray:
        # one-hot on text length parity: deterministic, obviously not
        # the hashing default
        out = np.zeros((len(texts), 2), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i, len(str(t)) % 2] = 1.0
        return out

    semantic.set_embedder(fake)
    try:
        ix = semantic.semantic_index(
            corpus, "doc_id", "text", chunk_size=100, dim=2
        )
        row = ix.filter("id = 0").collect()[0]
        assert list(row["vecs"][0]) in ([1.0, 0.0], [0.0, 1.0])
    finally:
        semantic.set_embedder(None)


def test_plan_no_rowwise_python(spark, corpus):
    ix = semantic.semantic_index(corpus, "doc_id", "text", chunk_size=4)
    out = semantic.semantic_topk(ix, "spark", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # row-wise Python forbidden
    assert "MapInPandas" in plan  # the one Arrow embedder pass


def test_unicode_query_and_zero_vector_guard(spark, corpus):
    rows = corpus.union(
        spark.createDataFrame([(3, "북경 날씨 北京天气 예보")],
                              "doc_id long, text string")
    )
    ix = semantic.semantic_index(rows, "doc_id", "text", chunk_size=8, dim=32)
    hits = semantic.semantic_topk(ix, "北京天气", k=1, dim=32).collect()
    assert hits[0]["id"] == 3  # CJK bigrams carry signal, not zero vectors
    with pytest.raises(ValueError, match="zero vector"):
        semantic.semantic_topk(ix, "!!! ???", k=1, dim=32)


def test_dim_mismatch_raises_not_nulls(spark, corpus):
    ix = semantic.semantic_index(corpus, "doc_id", "text", chunk_size=8, dim=32)
    with pytest.raises(Exception, match="dim"):
        semantic.semantic_topk(ix, "spark", k=1, dim=16).collect()
