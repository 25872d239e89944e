"""Rank-identity: engine top-k (doc_ids + scores) vs the pure-Python BM25
oracle on the reference query set (FIXTURES.md Q, q01-q12). Scores matched to
1e-6, ranks exactly — the golden-value discipline of reference test.py:80."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def oracle(transcripts_pdf):
    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src["doc_id"] = np.arange(len(src), dtype=np.int64)
    return BM25Oracle(src)


def assert_rank_identical(engine_df, oracle_pdf):
    got = engine_df.toPandas()
    assert list(got["doc_id"]) == list(oracle_pdf["doc_id"]), (
        f"rank mismatch\nengine:\n{got}\noracle:\n{oracle_pdf}"
    )
    assert np.allclose(got["score"], oracle_pdf["score"], atol=1e-6)


def test_q01_match_common_term(built_index, oracle):
    q = "the"
    assert_rank_identical(built_index.topk(q, 10), oracle.topk(q, 10))


def test_q02_match_rare_marker(built_index, oracle, transcripts_pdf):
    q = "zq0marker"
    res = built_index.topk(q, 10).toPandas()
    orc = oracle.topk(q, 10)
    assert list(res["doc_id"]) == list(orc["doc_id"])
    assert len(res) >= 1  # conv0 turn0 plants zq0marker


def test_q03_match_cjk(built_index, oracle):
    q = "삼성"
    assert_rank_identical(built_index.topk(q, 10), oracle.topk(q, 10))


def test_q04_match_multiterm_or(built_index, oracle):
    q = "the 삼성 w00123"
    assert_rank_identical(built_index.topk(q, 10), oracle.topk(q, 10))


def test_q05_bool_must_plus_filter(built_index, oracle, transcripts_pdf):
    q = "the and"
    src = oracle.docs
    mask = (src["role"] == "assistant").to_numpy()
    eng = built_index.topk(q, 10, mode="and", filters=F.col("role") == "assistant")
    orc = oracle.topk(q, 10, mode="and", mask=mask)
    assert_rank_identical(eng, orc)


def test_q06_bool_plus_range_filter(built_index, oracle):
    q = "the of"
    cut = pd.Timestamp("2024-01-01 01:00:00")
    mask = (oracle.docs["ts"] >= cut).to_numpy()
    eng = built_index.topk(q, 10, filters=F.col("ts") >= F.lit(cut))
    orc = oracle.topk(q, 10, mask=mask)
    assert_rank_identical(eng, orc)


def test_q07_term_filter_plus_match(built_index, oracle):
    q = "the"
    mask = (oracle.docs["tool"] == "bash").to_numpy()
    eng = built_index.topk(q, 10, filters=F.col("tool") == "bash")
    orc = oracle.topk(q, 10, mask=mask)
    assert_rank_identical(eng, orc)


def test_q08_wildcard_prefix(built_index, oracle):
    terms = built_index.expand_prefix("zq")
    assert all(t.startswith("zq") for t in terms)
    res = built_index.wildcard("zq", k=50).toPandas()
    # oracle: docs containing any zq* term, constant score, doc_id asc
    want = sorted(
        {
            did
            for did, toks in zip(oracle.doc_ids, oracle.tokens)
            for t in set(toks)
            if t.startswith("zq")
        }
    )[:50]
    assert list(res["doc_id"]) == want
    assert (res["score"] == 1.0).all()


def test_q09_exists_plus_match(built_index, oracle):
    q = "the"
    mask = oracle.docs["tool"].notna().to_numpy()
    eng = built_index.topk(q, 10, filters=F.col("tool").isNotNull())
    orc = oracle.topk(q, 10, mask=mask)
    assert_rank_identical(eng, orc)


def test_q10_match_all_count(built_index, transcripts_pdf):
    assert built_index.count() == len(transcripts_pdf)
    assert built_index.match_all().count() == len(transcripts_pdf)


def test_q11_get_by_key(built_index, transcripts_pdf):
    row = transcripts_pdf.iloc[17]
    got = built_index.get_by_key(row["conv_id"], int(row["turn_idx"])).collect()
    assert len(got) == 1
    assert got[0]["role"] == row["role"]


def test_q12_deep_topk_k100(built_index, oracle):
    q = "the and of"
    assert_rank_identical(built_index.topk(q, 100), oracle.topk(q, 100))


def test_pruned_equals_exhaustive(built_index):
    """Block-max pruning must be rank-identical to exhaustive scoring."""
    for q in ["the 삼성 w00123", "the and of", "w00001 w00002"]:
        a = built_index.topk(q, 10, prune=True).toPandas()
        b = built_index.topk(q, 10, prune=False).toPandas()
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert np.allclose(a["score"], b["score"], atol=1e-9)


def test_fuzzy_expansion(built_index):
    terms = built_index.expand_fuzzy("thz", 1)
    assert "the" in terms


def test_term_boost(built_index, oracle):
    """ES term boost (Running-ELK.md:284-294): a boosted term's contribution
    is multiplied; verified against a pandas recombination of single-term
    oracle scores."""
    q, boosted = "삼성 w00123", "삼성"
    a = oracle.scores("삼성").set_index("doc_id")["score"] * 2.0
    b = oracle.scores("w00123").set_index("doc_id")["score"]
    want = (
        a.add(b, fill_value=0.0)
        .rename("score")
        .reset_index()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    got = built_index.topk(q, 10, boosts={boosted: 2.0}).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["score"], want["score"], atol=1e-6)


def test_offset_pagination(built_index):
    """O2 pagination (reference page_no/page_count, import_dart_data.py:73-76)."""
    full = built_index.topk("the and of", 10).toPandas()
    page2 = built_index.topk("the and of", 5, offset=5).toPandas()
    assert list(page2["doc_id"]) == list(full["doc_id"][5:])


def test_pruned_topk_after_delete(built_index, spark, tmp_path_factory):
    """Regression (ADVICE r01): θ must exclude tombstoned docs. After
    deleting the current top docs, pruned topk must stay rank-identical to
    exhaustive scoring — a θ inflated by dead postings would skip blocks
    holding the new live top-k."""
    import shutil

    from dart_importer_spark.query.engine import InvertedIndex

    work = str(tmp_path_factory.mktemp("deleted") / "idx")
    shutil.copytree(built_index.dir, work)
    ix = InvertedIndex(spark, work)
    q = "the and of"
    top_before = ix.topk(q, 5, prune=False).toPandas()
    n = ix.delete_by_query(
        F.col("doc_id").isin([int(x) for x in top_before["doc_id"]])
    )
    assert n == 5
    a = ix.topk(q, 10, prune=True).toPandas()
    b = ix.topk(q, 10, prune=False).toPandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert np.allclose(a["score"], b["score"], atol=1e-9)
    assert not set(a["doc_id"]) & set(top_before["doc_id"])


def test_filter_pushdown_reduces_scored_rows(built_index):
    """Bool filters must mask postings BEFORE scoring (ES filter-first):
    with a selective allowed-set the scoring kernel emits fewer rows."""
    ds = built_index.doc_stats().filter(F.col("tool") == "bash").select("doc_id")
    allowed = np.sort(np.array([r["doc_id"] for r in ds.collect()], dtype=np.int64))
    assert allowed.size > 0
    full = built_index._score_terms(["the"], {"the": 1.0}).count()
    masked = built_index._score_terms(["the"], {"the": 1.0}, allowed=allowed).count()
    assert masked < full
    assert masked <= allowed.size


def test_offset_with_prune(built_index):
    """θ must bound the (offset+k)-th rank, not the k-th, or pagination
    pages past k lose pruned rows."""
    full = built_index.topk("the and of", 20, prune=False).toPandas()
    page = built_index.topk("the and of", 5, offset=8, prune=True).toPandas()
    assert list(page["doc_id"]) == list(full["doc_id"][8:13])


def test_bool_should(built_index, oracle):
    """ES bool {must, should}: must gates matching, should only adds score.
    Verified against a pandas recombination of single-term oracle scores."""
    must_s = oracle.scores("the").set_index("doc_id")["score"]
    bonus = oracle.scores("삼성").set_index("doc_id")["score"]
    want = (
        must_s.add(bonus.reindex(must_s.index).fillna(0.0), fill_value=None)
        .rename("score")
        .reset_index()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    got = built_index.topk("the", 10, mode="and", should="삼성").toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["score"], want["score"], atol=1e-6)
    # a doc matching only the should term must NOT appear
    only_should = set(bonus.index) - set(must_s.index)
    assert not set(got["doc_id"]) & only_should


def test_id_push_budget_fallback_identical(built_index, spark):
    """When the filter allow-set exceeds the push budget, the engine must
    fall back to the distributed semi-join and produce identical results
    (including a still-valid distributed θ)."""
    from dart_importer_spark.query.engine import InvertedIndex

    tiny = InvertedIndex(spark, built_index.dir, id_push_budget=1)
    for q, flt in [
        ("the and of", F.col("role") == "assistant"),
        ("the 삼성", F.col("tool").isNotNull()),
    ]:
        a = built_index.topk(q, 10, filters=flt).toPandas()
        b = tiny.topk(q, 10, filters=flt).toPandas()
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert np.allclose(a["score"], b["score"], atol=1e-12)


def test_facet_terms_aggregation(built_index, oracle):
    """ES terms agg over the match set: docs containing any query term,
    bucketed by a metadata column, count desc."""
    got = {r["role"]: r["doc_count"] for r in built_index.facet("the", by="role").collect()}
    want: dict[str, int] = {}
    roles = oracle.docs["role"].tolist()
    for did, toks in zip(oracle.doc_ids, oracle.tokens):
        if "the" in toks:
            want[roles[did]] = want.get(roles[did], 0) + 1
    assert got == want


def test_multi_get_by_keys(built_index, transcripts_pdf):
    """ES _mget: batch point lookups, segment-pruned + broadcast semi-join."""
    rows = [transcripts_pdf.iloc[i] for i in (3, 17, 101)]
    keys = [(r["conv_id"], int(r["turn_idx"])) for r in rows]
    got = built_index.get_by_keys(keys).collect()
    assert len(got) == 3
    assert {(r["conv_id"], r["turn_idx"]) for r in got} == set(keys)
    # missing key -> simply absent
    got2 = built_index.get_by_keys(keys + [("convZZZ", 0)]).collect()
    assert len(got2) == 3


def test_index_stats(built_index, transcripts_pdf):
    s = built_index.stats()
    assert s["n_docs"] == len(transcripts_pdf)
    assert s["n_postings"] > 0 and s["n_runs"] > 0
    assert s["n_tombstones"] == 0
    assert 0 in s["avgdl_by_field"]
