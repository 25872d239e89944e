"""ES ``helpers.scan`` parity — the scroll iterator the reference drains
whole indexes with (import_dart_data.py:562; test.py:72-80 asserts the
drained doc count equals the index count, which is exactly
``test_scan_match_all_drains_index`` below). Scan is the unscored
filter-context match set, snapshot-pinned at call time and streamed
partition-at-a-time; ``scan_df`` is the same set as one DataFrame for
downstream Spark stages."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.dsl import DslError
from dart_importer_spark.query.engine import InvertedIndex


def test_scan_match_all_drains_index(built_index):
    n = 0
    ids = set()
    first = None
    for doc in built_index.scan():
        if first is None:
            first = doc
        ids.add(doc["_id"])
        n += 1
    assert n == built_index.count()
    assert len(ids) == n  # distinct docs, no duplicates across pages
    # _source carries the stored user columns, never engine internals
    assert set(first) == {"_id", "_source"}
    src = first["_source"]
    assert {"conv_id", "turn_idx", "role", "tool", "ts"} <= set(src)
    assert "doc_id" not in src and "seg" not in src and "dl" not in src


def test_scan_query_and_filter_scoped(built_index):
    # a match body scans exactly the docs search() would score
    body = {"query": {"match": {"text": "of to"}}}
    got = {d["_id"] for d in built_index.scan(body)}
    want = {
        r["doc_id"]
        for r in built_index.search({**body, "size": 10**6}).collect()
    }
    assert got == want and got
    # a pure-filter body = the filtered doc_stats scan
    fbody = {"query": {"term": {"role": "tool"}}}
    got_f = {d["_id"] for d in built_index.scan(fbody)}
    want_f = {
        r["doc_id"]
        for r in built_index.doc_stats()
        .filter(F.col("role") == "tool").select("doc_id").collect()
    }
    assert got_f == want_f and got_f
    # scan and _count are the same document set
    assert len(got_f) == built_index.count_body(fbody)


def test_scan_bool_must_not(built_index):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "must_not": [{"match": {"text": "of"}}],
    }}}
    got = {d["_id"] for d in built_index.scan(body)}
    assert len(got) == built_index.count_body(body)
    bad = {d["_id"] for d in built_index.scan(
        {"query": {"match": {"text": "of"}}})}
    assert bad and not (got & bad)


def test_scan_source_projection(built_index):
    docs = list(built_index.scan(
        {"query": {"term": {"role": "tool"}}, "_source": ["role", "tool"]}
    ))
    assert docs and all(set(d["_source"]) == {"role", "tool"} for d in docs)
    assert all(d["_source"]["role"] == "tool" for d in docs)
    none = list(built_index.scan({"_source": False}))
    assert none and all(d["_source"] == {} for d in none)
    with pytest.raises(DslError, match="_source"):
        next(iter(built_index.scan({"_source": ["nope"]})))


def test_scan_rejects_scored_clauses(built_index):
    with pytest.raises(DslError, match="scan"):
        built_index.scan({"query": {"match_phrase": {"text": "the data"}}})


def test_scan_pins_snapshot_across_delete(spark, built_index, tmp_path):
    """The scroll-consistency contract: a scan opened before a delete
    drains the pre-delete view even when the delete lands mid-scroll;
    a scan opened after sees the post-delete view."""
    dst = str(tmp_path / "scan_pit_idx")
    shutil.copytree(built_index.dir, dst)
    ix = InvertedIndex(spark, dst)
    n0 = ix.count()

    it = ix.scan()            # snapshot opens HERE, not at first next()
    seen = [next(it)]         # scroll has started
    n_tool = ix.delete_by_query(F.col("role") == "tool")
    assert n_tool > 0
    seen.extend(it)           # drain the rest after the delete
    assert len(seen) == n0    # pre-delete view, scroll-consistent

    assert len(list(ix.scan())) == n0 - n_tool  # fresh scan: live view
    # an explicit pit body key reuses a caller-held snapshot
    assert ix.scan_df({"pit": {"id": {"tombstone_files": []}}}).count() == n0


def test_scan_df_match_all_plan_is_one_scan(built_index):
    """match_all / pure-filter scans must compile to a single pruned
    doc_stats scan — no join, no shuffle (the 100-TB drain path)."""
    plan = built_index.scan_df()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    plan_f = built_index.scan_df(
        {"query": {"term": {"role": "tool"}}}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_f
