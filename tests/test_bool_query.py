"""ES bool must_not + minimum_should_match semantics and the query profile
(mask-pushdown vs distributed-fallback plan record)."""

from __future__ import annotations

import numpy as np
import pytest

from dart_importer_spark.query.engine import InvertedIndex
from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def oracle(transcripts_pdf):
    src = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src["doc_id"] = np.arange(len(src), dtype=np.int64)
    return BM25Oracle(src)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_must_not_excludes_term_matches(built_index, oracle):
    got = built_index.topk("the and", k=15, must_not="w00042").toPandas()
    s = oracle.scores("the and")
    excluded = {
        int(did)
        for did, toks in zip(oracle.doc_ids, oracle.tokens)
        if "w00042" in toks
    }
    assert excluded, "fixture term w00042 must occur somewhere"
    s = s[~s["doc_id"].isin(excluded)]
    s = s.sort_values(["score", "doc_id"], ascending=[False, True]).head(15)
    assert list(got["doc_id"]) == list(s["doc_id"])
    assert np.allclose(got["score"], s["score"], atol=1e-6)
    # and the unfiltered query DOES return at least one excluded doc
    plain = set(built_index.topk("the and", k=15).toPandas()["doc_id"])
    assert plain != set(got["doc_id"])


def test_min_should_match_gates_on_matched_terms(built_index, oracle):
    q = "the w00042 w00123"
    got = built_index.topk(q, k=15, min_should_match=2).toPandas()
    s = oracle.scores(q)
    s = s[s["n_matched"] >= 2]
    s = s.sort_values(["score", "doc_id"], ascending=[False, True]).head(15)
    assert list(got["doc_id"]) == list(s["doc_id"])
    assert np.allclose(got["score"], s["score"], atol=1e-6)


def test_msm_one_equals_plain_or(built_index):
    q = "the w00042"
    assert _rows(built_index.topk(q, k=10, min_should_match=1)) == _rows(
        built_index.topk(q, k=10)
    )


def test_profile_records_budget_fallback(spark, built_index):
    """VERDICT r02 #10: when a mask exceeds id_push_budget the query silently
    switches to the distributed plan — last_profile must expose which ran,
    and both plans must return identical results."""
    from pyspark.sql import functions as F

    tiny = InvertedIndex(spark, built_index.dir, id_push_budget=1)
    flt = F.col("role") == "assistant"

    wide = built_index.topk("the and", k=10, filters=flt, round_scores=6)
    assert built_index.last_profile["allowed_pushed"] is True
    assert built_index.last_profile["filter_present"] is True

    narrow = tiny.topk("the and", k=10, filters=flt, round_scores=6)
    assert tiny.last_profile["allowed_pushed"] is False  # budget exceeded
    assert _rows(wide) == _rows(narrow)  # plan choice is invisible in results

    # same flip for the dead mask (must_not exclusions ride it)
    e1 = built_index.topk("the and", k=10, must_not="w00042", round_scores=6)
    assert built_index.last_profile["dead_pushed"] is True
    e2 = tiny.topk("the and", k=10, must_not="w00042", round_scores=6)
    assert tiny.last_profile["dead_pushed"] is False
    assert tiny.last_profile["dead_present"] is True
    assert _rows(e1) == _rows(e2)


def test_search_after_equals_offset(built_index):
    q = "the and"
    page1 = built_index.topk(q, k=10, round_scores=6).collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    via_after = _rows(built_index.topk(q, k=10, round_scores=6, search_after=cursor))
    via_offset = _rows(built_index.topk(q, k=10, round_scores=6, offset=10))
    assert via_after == via_offset
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exclusive"):
        built_index.topk(q, k=5, offset=5, search_after=cursor)


def test_histogram_and_stats_agg(built_index, oracle):
    hits = {
        int(did)
        for did, toks in zip(oracle.doc_ids, oracle.tokens)
        if "the" in toks
    }
    dl = {int(d): int(n) for d, n in zip(oracle.doc_ids, oracle.dl)}
    got = {
        r["bucket"]: r["doc_count"]
        for r in built_index.histogram("the", by="dl", interval=10).collect()
    }
    want: dict = {}
    for d in hits:
        b = (dl[d] // 10) * 10
        want[b] = want.get(b, 0) + 1
    assert got == want

    row = built_index.stats_agg("the", on="dl").collect()[0]
    vals = [dl[d] for d in hits]
    assert row["count"] == len(vals)
    assert row["min"] == min(vals) and row["max"] == max(vals)
    assert row["sum"] == sum(vals)
    assert abs(row["avg"] - sum(vals) / len(vals)) < 1e-9


def test_last_profile_reset_on_early_return(built_index):
    """An empty-analysis or unknown-term topk must clear last_profile, not
    leave the previous query's plan record in place."""
    built_index.topk("the", 5).collect()
    assert built_index.last_profile  # populated by a real query
    built_index.topk("zzqqxxyy_not_a_term", 5)
    assert built_index.last_profile == {}
    built_index.topk("", 5)
    assert built_index.last_profile == {}
