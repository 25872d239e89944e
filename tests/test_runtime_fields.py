"""ES runtime_mappings: query-time computed fields as Catalyst expressions
(the engine's scripting dialect in place of Painless). A runtime field must
behave exactly like a stored doc_stats column in every consumer — filter
context, aggregations, terms_enum — and shadow stored columns ES-style."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_runtime_field_filter_and_facet(built_index, transcripts_pdf):
    view = built_index.with_runtime_fields(
        {"turn_bucket": "turn_idx % 3"}
    )
    got = view.facet(None, by="turn_bucket", k=10).toPandas()
    want = (
        transcripts_pdf["turn_idx"].mod(3).value_counts().sort_index()
    )
    got = got.sort_values("turn_bucket")
    assert list(got["turn_bucket"]) == list(want.index)
    assert list(got["doc_count"]) == list(want.values)
    # filter context over the runtime field
    n = view.count(F.col("turn_bucket") == 0)
    assert n == int((transcripts_pdf["turn_idx"] % 3 == 0).sum())


def test_runtime_field_chaining_and_shadowing(built_index, transcripts_pdf):
    # a runtime field may reference an earlier one, and may shadow a
    # stored meta column (ES runtime fields shadow mapped fields)
    view = built_index.with_runtime_fields(
        {"role": "upper(role)", "role2": "concat(role, '!')"}
    )
    roles = [r["term"] for r in view.terms_enum("role", size=10).collect()]
    assert roles == sorted(
        transcripts_pdf["role"].str.upper().unique()
    )
    roles2 = [r["term"] for r in view.terms_enum("role2", size=10).collect()]
    assert roles2 == sorted(
        (transcripts_pdf["role"].str.upper() + "!").unique()
    )
    # the base index is untouched by the view
    base_roles = [
        r["term"] for r in built_index.terms_enum("role", size=10).collect()
    ]
    assert base_roles == sorted(transcripts_pdf["role"].unique())


def test_runtime_field_validation(built_index):
    with pytest.raises(ValueError, match="shadow"):
        built_index.with_runtime_fields({"doc_id": "1"})
    with pytest.raises(ValueError, match="compile"):
        built_index.with_runtime_fields({"x": "no_such_column + 1"})
    with pytest.raises(ValueError, match="compile"):
        built_index.with_runtime_fields({"x": "this is not sql ("})


def test_runtime_mappings_in_search_and_aggs_and_count(
    built_index, transcripts_pdf
):
    from dart_importer_spark.query import dsl

    rm = {
        "turn_bucket": {
            "type": "long", "script": {"source": "turn_idx % 3"}
        }
    }
    # filter context in a search body
    hits = dsl.search(built_index, {
        "runtime_mappings": rm,
        "query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"term": {"turn_bucket": 1}}],
        }},
        "size": 5,
    }).toPandas()
    assert len(hits) > 0
    ds = built_index.with_runtime_fields(
        {"turn_bucket": "turn_idx % 3"}
    ).doc_stats().select("doc_id", "turn_bucket").toPandas()
    ok = set(ds.loc[ds["turn_bucket"] == 1, "doc_id"])
    assert set(hits["doc_id"]).issubset(ok)

    # terms agg over the runtime field
    out = dsl.aggs(built_index, {
        "runtime_mappings": rm,
        "aggs": {"b": {"terms": {"field": "turn_bucket", "size": 10}}},
    })["b"].toPandas().sort_values("turn_bucket")
    want = transcripts_pdf["turn_idx"].mod(3).value_counts().sort_index()
    assert list(out["doc_count"]) == list(want.values)

    # count body
    n = dsl.count(built_index, {
        "runtime_mappings": rm,
        "query": {"term": {"turn_bucket": 2}},
    })
    assert n == int((transcripts_pdf["turn_idx"] % 3 == 2).sum())


def test_runtime_mappings_bad_spec(built_index):
    from dart_importer_spark.query.dsl import DslError, search

    with pytest.raises(DslError, match="script.source"):
        search(built_index, {
            "runtime_mappings": {"x": {"type": "long"}},
            "query": {"match_all": {}},
        })
