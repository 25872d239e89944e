"""ES geo_line aggregation: per-group LineStrings ordered by a sort
column, ES-capped truncation with the `complete` flag — checked against
hand-computed tracks."""

from __future__ import annotations

import pytest

from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex

ROWS = [
    # (conv_id, turn_idx, text, grp, t, lat, lon) — two vehicle tracks
    ("c1", 0, "ping", "a", 3, 10.0, 100.0),
    ("c1", 1, "ping", "a", 1, 11.0, 101.0),
    ("c1", 2, "ping", "a", 2, 12.0, 102.0),
    ("c2", 0, "ping", "b", 5, 20.0, 110.0),
    ("c2", 1, "ping", "b", 4, 21.0, 111.0),
    ("c3", 0, "ping", "b", 6, None, 112.0),  # null point: dropped
]


@pytest.fixture(scope="module")
def geo_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string, grp string, "
              "t int, lat double, lon double"
    )
    out = str(tmp_path_factory.mktemp("geoline") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("grp", "t", "lat", "lon"),
    )
    return InvertedIndex(spark, out)


def test_geo_line_grouped_sorted(geo_index):
    rows = {
        r["grp"]: r
        for r in geo_index.geo_line("t", by="grp").collect()
    }
    # group a ordered by t=1,2,3 -> [lon,lat] pairs (GeoJSON order)
    assert [list(p) for p in rows["a"]["line"]] == [
        [101.0, 11.0], [102.0, 12.0], [100.0, 10.0]]
    assert rows["a"]["point_count"] == 3 and rows["a"]["complete"]
    # group b: the null-lat point never enters the line
    assert [list(p) for p in rows["b"]["line"]] == [
        [111.0, 21.0], [110.0, 20.0]]
    assert rows["b"]["point_count"] == 2


def test_geo_line_desc_truncation_and_sort_values(geo_index):
    row = geo_index.geo_line(
        "t", by="grp", size=2, sort_order="desc", include_sort=True
    ).filter("grp = 'a'").collect()[0]
    # desc keeps t=3,2 (the FIRST two in sort order), line in that order
    assert [list(p) for p in row["line"]] == [[100.0, 10.0], [102.0, 12.0]]
    assert row["sort_values"] == [3, 2]
    assert row["point_count"] == 3 and not row["complete"]


def test_geo_line_global_and_query_scoped(geo_index):
    row = geo_index.geo_line("t", query="ping").collect()[0]
    assert row["point_count"] == 5 and len(row["line"]) == 5
    assert [list(row["line"][0]), list(row["line"][-1])] == [
        [101.0, 11.0], [110.0, 20.0]]


def test_geo_line_guards(geo_index):
    with pytest.raises(ValueError, match="size must be"):
        geo_index.geo_line("t", size=0)
    with pytest.raises(ValueError, match="size must be"):
        geo_index.geo_line("t", size=10001)
    with pytest.raises(ValueError, match="sort_order"):
        geo_index.geo_line("t", sort_order="up")


def test_geo_line_dsl_body(geo_index):
    from dart_importer_spark.query.dsl import DslError, aggs

    out = aggs(geo_index, {
        "aggs": {"track": {"geo_line": {
            "point": {"field": "pos"},  # resolves lat/lon pair
            "sort": {"field": "t"},
            "sort_order": "DESC",
            "size": 3,
        }}},
    })["track"].collect()[0]
    # the null-lat row is filtered, so desc keeps t=5,4,3
    assert [list(p) for p in out["line"]] == [
        [110.0, 20.0], [111.0, 21.0], [100.0, 10.0]]
    assert out["point_count"] == 5 and not out["complete"]
    with pytest.raises(DslError, match="point.field and sort.field"):
        aggs(geo_index, {"aggs": {"x": {"geo_line": {"sort": {}}}}})


def test_geo_line_one_shuffle_plan(geo_index):
    # window (rank/total) and groupBy share the partitioning key: the
    # whole agg must carry ONE Exchange and no Python
    import re

    df = geo_index.geo_line("t", by="grp")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
