"""Regression tests for the fourth review pass (ES|QL core + part-13 agg
family): unparseable date_range bounds, pipeline buckets_path resolution,
INLINESTATS shadowing/guards, all-NULL percentile buckets, the
CHANGE_POINT series cap."""

from __future__ import annotations

import pytest

from dart_importer_spark.query import dsl
from dart_importer_spark.query.dsl import DslError
from dart_importer_spark.query.esql import EsqlError, esql


def test_date_range_agg_rejects_unparseable_bounds(built_index):
    # ES date-math / anything Spark's to_timestamp cannot parse must
    # raise, not silently count 0 via a NULL condition
    with pytest.raises(ValueError, match="unparseable"):
        built_index.date_range_agg(None, "ts", [("now-7d/d", None)])
    ok = built_index.date_range_agg(
        None, "ts", [("2024-01-01", None)]
    ).collect()
    assert ok[0]["doc_count"] > 0


def test_facet_percentiles_keeps_all_null_bucket(built_index):
    ix = built_index.with_runtime_fields({
        "m": "CASE WHEN role = 'user' THEN CAST(NULL AS DOUBLE) "
             "ELSE CAST(turn_idx AS DOUBLE) END"
    })
    out = ix.facet_percentiles(
        None, by="role", on="m", percents=(50.0,), k=10
    ).toPandas()
    # the all-NULL bucket must SURVIVE with a null value, not vanish
    assert "user" in set(out["role"])
    assert out[out["role"] == "user"]["value"].isna().all()
    assert out[out["role"] == "assistant"]["value"].notna().all()


def test_inlinestats_global_replaces_shadowed_column(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 4.0)], "id long, lang string, n double"
    )
    out = esql(spark, "FROM t | INLINESTATS n = MAX(n) | WHERE n == 4.0",
               {"t": df}).collect()
    assert len(out) == 2 and all(r["n"] == 4.0 for r in out)


def test_inlinestats_by_refuses_composite_aggregates(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 4.0)], "id long, lang string, n double"
    )
    with pytest.raises(EsqlError, match="WEIGHTED_AVG"):
        esql(spark, "FROM t | INLINESTATS w = WEIGHTED_AVG(n, id) BY lang",
             {"t": df})
    # the global (no BY) form aggregates to one row — still allowed
    ok = esql(spark, "FROM t | INLINESTATS w = WEIGHTED_AVG(n, id)",
              {"t": df}).collect()
    assert all(abs(r["w"] - 10.0 / 3.0) < 1e-9 for r in ok)


def test_change_point_series_cap(spark):
    big = spark.range(1500).selectExpr("id", "cast(id as double) as v")
    with pytest.raises(EsqlError, match="1000 points"):
        esql(spark, "FROM t | CHANGE_POINT v ON id", {"t": big})


def test_dh_pipeline_buckets_path_resolution(built_index):
    def body(bp):
        return {"query": {"match": {"text": "the"}}, "aggs": {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "m": {"sum": {"field": "turn_idx"}},
                "cs": {"cumulative_sum": {"buckets_path": bp}},
            },
        }}}

    over_count = dsl.aggs(built_index, body("_count"))["h"].toPandas()
    over_metric = dsl.aggs(built_index, body("m"))["h"].toPandas()
    # _count must target doc_count even with a sum sibling present —
    # previously the sum sibling silently hijacked the series
    assert not over_count.equals(over_metric)
    with pytest.raises(DslError, match="names no sibling"):
        dsl.aggs(built_index, body("nope"))
