"""ES nested-document semantics: operators/nested.py + the engine's
nested query clause / nested aggregation over array<struct> meta columns.

The load-bearing assertion throughout: nested (same-element) and object
(flattened, cross-element) semantics DIVERGE on data where two conditions
hold on different elements of the same parent — the classic ES pitfall
the nested type exists to fix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators import nested as N
from dart_importer_spark.query import dsl
from dart_importer_spark.query.dsl import DslError


@pytest.fixture(scope="module")
def parents(spark):
    # parent A: cond1 and cond2 on the SAME element; parent B: on
    # DIFFERENT elements; parent C: neither
    rows = [
        ("A", 0, "x", 10),
        ("A", 1, "y", 99),
        ("A", 2, "x", 99),  # x AND >=50 co-match here
        ("B", 0, "x", 10),
        ("B", 1, "y", 99),  # x on elem 0, >=50 on elem 1 — never together
        ("C", 0, "y", 10),
    ]
    df = spark.createDataFrame(rows, ["pid", "idx", "tag", "val"])
    return N.nest(
        df, keys=["pid"], elem_cols=["idx", "tag", "val"],
        order_by=["idx"], out_col="kids",
    )


def test_nest_deterministic_order(parents):
    got = {r["pid"]: r["kids"] for r in parents.collect()}
    assert [k["idx"] for k in got["A"]] == [0, 1, 2]
    assert [k["tag"] for k in got["B"]] == ["x", "y"]
    # struct fields projected down to elem_cols
    assert set(got["C"][0].asDict()) == {"idx", "tag", "val"}


def test_same_element_vs_any_element(parents):
    p_tag = lambda x: x["tag"] == "x"  # noqa: E731
    p_val = lambda x: x["val"] >= 50  # noqa: E731
    out = parents.select(
        "pid",
        N.same_element("kids", p_tag, p_val).alias("nested"),
        N.any_element("kids", p_tag, p_val).alias("object"),
    )
    got = {r["pid"]: (r["nested"], r["object"]) for r in out.collect()}
    assert got["A"] == (True, True)  # same element satisfies both
    assert got["B"] == (False, True)  # the flattened false positive
    assert got["C"] == (False, False)
    with pytest.raises(ValueError):
        N.same_element("kids")


def test_inner_hits_operator(parents):
    p_tag = lambda x: x["tag"] == "x"  # noqa: E731
    p_val = lambda x: x["val"] >= 50  # noqa: E731
    out = N.inner_hits(parents, "kids", p_tag, p_val, size=2)
    got = {r["pid"]: r["kids_inner_hits"] for r in out.collect()}
    # only A has a same-element match; the hit is the element itself
    assert set(got) == {"A"}
    assert [(h["idx"], h["tag"], h["val"]) for h in got["A"]] == [(2, "x", 99)]
    # size caps the returned elements, array order preserved
    many = N.inner_hits(parents, "kids", lambda x: x["val"] >= 0, size=2)
    m = {r["pid"]: [h["idx"] for h in r["kids_inner_hits"]]
         for r in many.collect()}
    assert m["A"] == [0, 1] and m["B"] == [0, 1] and m["C"] == [0]
    with pytest.raises(ValueError):
        N.inner_hits(parents, "kids")


def test_explode_nested(parents):
    ex = N.explode_nested(parents, "kids", parent_cols=["pid"])
    assert set(ex.columns) == {"pid", "kids.idx", "kids.tag", "kids.val"}
    assert ex.count() == 6


@pytest.fixture(scope="module")
def nested_index(spark, transcripts_df, tmp_path_factory):
    """A conversation-level index: text = concatenated turns, plus the
    turns themselves as a nested (array<struct>) meta column."""
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    convs = N.nest(
        transcripts_df, keys=["conv_id"],
        elem_cols=["turn_idx", "role", "text", "tool"],
        order_by=["turn_idx"], out_col="turns",
    )
    docs = convs.join(
        transcripts_df.groupBy("conv_id").agg(
            F.concat_ws(
                " ",
                F.sort_array(
                    F.collect_list(F.struct("turn_idx", "text"))
                ).getField("text"),
            ).alias("text"),
            F.count("*").alias("n_turns"),
        ),
        "conv_id",
    )
    out = str(tmp_path_factory.mktemp("nested_ix") / "ix")
    build_index(
        spark, docs, out, BuildConfig(n_segments=2, n_buckets=4),
        doc_key_cols=("conv_id",), text_cols=("text",),
        meta_cols=("n_turns", "turns"),
    )
    return InvertedIndex(spark, out)


def _pdf(transcripts_df):
    return transcripts_df.toPandas()


def test_nested_query_through_dsl(nested_index, transcripts_df):
    tr = _pdf(transcripts_df)
    body = lambda q: {  # noqa: E731
        "query": {"bool": {"filter": [{"nested": {"path": "turns",
                                                  "query": q}}]}},
        "size": 1000,
    }
    # same-element: a tool turn in the first 3 positions
    inner = {"bool": {"must": [
        {"term": {"turns.role": "tool"}},
        {"range": {"turns.turn_idx": {"lt": 3}}},
    ]}}
    got = dsl.search(nested_index, body(inner)).count()
    per = tr[(tr.role == "tool") & (tr.turn_idx < 3)].conv_id.nunique()
    assert got == per
    # object semantics (two independent nested clauses) must be >= and,
    # on this corpus, strictly diverge
    b2 = {
        "query": {"bool": {"filter": [
            {"nested": {"path": "turns",
                        "query": {"term": {"turns.role": "tool"}}}},
            {"nested": {"path": "turns",
                        "query": {"range": {"turns.turn_idx": {"lt": 3}}}}},
        ]}},
        "size": 1000,
    }
    obj = dsl.search(nested_index, b2).count()
    have_tool = set(tr[tr.role == "tool"].conv_id)
    have_early = set(tr[tr.turn_idx < 3].conv_id)
    assert obj == len(have_tool & have_early)
    assert obj > got  # the divergence that motivates the nested type


def test_nested_inner_hits_through_dsl(nested_index, transcripts_df):
    tr = _pdf(transcripts_df)
    body = {
        "query": {"nested": {
            "path": "turns",
            "query": {"bool": {"must": [
                {"term": {"turns.role": "tool"}},
                {"range": {"turns.turn_idx": {"lt": 3}}},
            ]}},
            "inner_hits": {"size": 2},
        }},
        "size": 1000,
    }
    out = dsl.search(nested_index, body).collect()
    per = tr[(tr.role == "tool") & (tr.turn_idx < 3)]
    assert len(out) == per.conv_id.nunique()
    for r in out:
        hits = r["inner_hits"]
        assert 1 <= len(hits) <= 2
        for h in hits:
            assert h["role"] == "tool" and h["turn_idx"] < 3


def test_nested_inner_hits_inside_bool(nested_index, transcripts_df):
    tr = _pdf(transcripts_df)
    body = {
        "query": {"bool": {"filter": [
            {"nested": {
                "path": "turns",
                "query": {"term": {"turns.role": "tool"}},
                "inner_hits": {"size": 2, "name": "tools"},
            }},
            {"range": {"n_turns": {"gte": 2}}},
        ]}},
        "size": 1000,
    }
    out = dsl.search(nested_index, body).collect()
    per = tr[tr.role == "tool"].groupby("conv_id").size()
    sizes = tr.groupby("conv_id").size()
    want = {c for c in per.index if sizes[c] >= 2}
    assert {r["doc_id"] for r in out} == {
        r["doc_id"] for r in out
    } and len(out) == len(want)
    for r in out:
        hits = r["inner_hits_tools"]
        assert 1 <= len(hits) <= 2
        assert all(h["role"] == "tool" for h in hits)


def test_nested_inner_hits_inside_constant_score(nested_index, transcripts_df):
    tr = _pdf(transcripts_df)
    body = {
        "query": {"constant_score": {"filter": {"nested": {
            "path": "turns",
            "query": {"term": {"turns.role": "tool"}},
            "inner_hits": {"size": 1},
        }}, "boost": 2.0}},
        "size": 1000,
    }
    out = dsl.search(nested_index, body).collect()
    assert len(out) == tr[tr.role == "tool"].conv_id.nunique()
    for r in out:
        assert r["score"] == 2.0
        assert len(r["inner_hits_turns"]) == 1
        assert r["inner_hits_turns"][0]["role"] == "tool"


def test_nested_agg_and_reverse_nested(nested_index, transcripts_df):
    tr = _pdf(transcripts_df)
    out = dsl.aggs(nested_index, {"aggs": {"n": {
        "nested": {"path": "turns"},
        "aggs": {"roles": {"terms": {"field": "turns.role", "size": 10},
                           "aggs": {"back": {"reverse_nested": {}}}}},
    }}})["n"].toPandas()
    # doc_count = nested sub-documents (turns); parent_doc_count = convs
    want_elems = tr.groupby("role").size()
    want_parents = tr.groupby("role")["conv_id"].nunique()
    for _, row in out.iterrows():
        assert row["doc_count"] == want_elems[row["role"]]
        assert row["parent_doc_count"] == want_parents[row["role"]]
    # element-level filter via the engine API
    nt = nested_index.nested_terms(
        "turns", "role", nested_filter=lambda x: x["turn_idx"] == 0, k=5
    ).toPandas()
    want0 = tr[tr.turn_idx == 0].groupby("role").size()
    for _, row in nt.iterrows():
        assert row["doc_count"] == want0[row["role"]]


def test_nested_validation(nested_index):
    with pytest.raises(DslError, match="not a doc_stats column"):
        dsl.search(nested_index, {"query": {"nested": {
            "path": "nope", "query": {"match_all": {}}}}})
    with pytest.raises(DslError, match="array<struct>"):
        dsl.search(nested_index, {"query": {"nested": {
            "path": "n_turns", "query": {"match_all": {}}}}})
    with pytest.raises(DslError, match="not a field of"):
        dsl.search(nested_index, {"query": {"nested": {
            "path": "turns", "query": {"term": {"turns.nope": "x"}}}}})
    with pytest.raises(DslError, match="unsupported inner clause"):
        dsl.search(nested_index, {"query": {"nested": {
            "path": "turns", "query": {"match": {"turns.text": "hi"}}}}})
    with pytest.raises(DslError, match="reverse_nested"):
        dsl.aggs(nested_index, {"aggs": {"n": {
            "nested": {"path": "turns"},
            "aggs": {"t": {"terms": {"field": "turns.role"},
                           "aggs": {"x": {"max": {"field": "v"}}}}},
        }}})
    with pytest.raises(ValueError, match="not a field"):
        nested_index.nested_terms("turns", "nope")


def test_nested_plan_is_narrow(nested_index):
    """The nested predicate is a pure Catalyst filter over the parent
    scan: no Python evaluation, no join (the no-child-table-join property
    that makes nested fields scale)."""
    body = {"query": {"bool": {"filter": [{"nested": {
        "path": "turns",
        "query": {"term": {"turns.role": "tool"}}}}]}}, "size": 10}
    plan = dsl.search(nested_index, body)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    nt_plan = (
        nested_index.nested_terms("turns", "role", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in nt_plan
    assert "CartesianProduct" not in nt_plan


def test_bare_toplevel_nested_query(nested_index, transcripts_df):
    # the common ES spelling — {'query': {'nested': ...}} with no bool
    # wrapper — must work as a constant-score filter query
    tr = _pdf(transcripts_df)
    got = dsl.search(nested_index, {
        "query": {"nested": {"path": "turns",
                             "query": {"term": {"turns.role": "tool"}}}},
        "size": 1000,
    })
    assert got.count() == tr[tr.role == "tool"].conv_id.nunique()
    assert set(r["score"] for r in got.select("score").distinct().collect()) == {1.0}


def test_nested_agg_refuses_unsupported_options(nested_index):
    # silently-different buckets are worse than refusing: unimplemented
    # terms options and reverse_nested payloads must raise
    with pytest.raises(DslError, match="unsupported terms options"):
        dsl.aggs(nested_index, {"aggs": {"n": {
            "nested": {"path": "turns"},
            "aggs": {"r": {"terms": {"field": "turns.role",
                                     "min_doc_count": 5}}},
        }}})
    with pytest.raises(DslError, match="reverse_nested options"):
        dsl.aggs(nested_index, {"aggs": {"n": {
            "nested": {"path": "turns"},
            "aggs": {"r": {"terms": {"field": "turns.role"},
                           "aggs": {"b": {"reverse_nested":
                                          {"path": "other"}}}}},
        }}})
