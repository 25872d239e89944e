"""DSL dispatch for the geo family and the new pipeline aggs: each ES
body must translate to exactly the direct engine call (row-for-row)."""

from __future__ import annotations

import pytest

from dart_importer_spark.query import dsl
from dart_importer_spark.query.dsl import DslError, _parse_distance_km

RM = {
    "lat": {"type": "double",
            "script": {"source": "CAST(-59.5 + (doc_id*7 % 120) AS DOUBLE)"}},
    "lon": {"type": "double",
            "script": {"source": "CAST(-169.5 + (doc_id*13 % 340) AS DOUBLE)"}},
}


def rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def geo_index(built_index):
    return built_index.with_runtime_fields(
        {k: v["script"]["source"] for k, v in RM.items()}
    )


def test_geo_distance_filter_clause(built_index, geo_index):
    body = {
        "runtime_mappings": RM,
        "query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"geo_distance": {
                "distance": "3000km", "location": {"lat": 10.0, "lon": 20.0},
            }}],
        }},
        "size": 500,
    }
    got = {r.doc_id for r in built_index.search(body).collect()}
    want = set(
        r.doc_id
        for r in geo_index.geo_distance((10.0, 20.0), 3000.0, query="the").collect()
    )
    assert got == want and got


def test_geo_bounding_box_filter_clause(built_index, geo_index):
    body = {
        "runtime_mappings": RM,
        "query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"geo_bounding_box": {"location": {
                "top_left": {"lat": 40.0, "lon": -60.0},
                "bottom_right": {"lat": -20.0, "lon": 80.0},
            }}}],
        }},
        "size": 500,
    }
    got = {r.doc_id for r in built_index.search(body).collect()}
    want = {
        r.doc_id
        for r in geo_index.geo_bounding_box(
            (40.0, -60.0), (-20.0, 80.0), query="the"
        ).collect()
    }
    assert got == want and got


def test_geo_distance_units():
    assert _parse_distance_km("3000km") == 3000.0
    assert _parse_distance_km("500m") == 0.5
    assert _parse_distance_km(2000) == 2.0  # bare = meters, ES default
    assert _parse_distance_km("1mi") == pytest.approx(1.609344)


def test_geotile_and_centroid_aggs(built_index, geo_index):
    out = dsl.aggs(built_index, {
        "runtime_mappings": RM,
        "query": {"match": {"text": "the"}},
        "aggs": {
            "tiles": {"geotile_grid": {"field": "location", "precision": 3,
                                       "size": 20}},
            "c": {"geo_centroid": {"field": "location"}},
        },
    })
    assert rows(out["tiles"]) == rows(geo_index.geotile_grid(3, query="the", k=20))
    assert rows(out["c"]) == rows(geo_index.geo_centroid(query="the"))


def test_geo_field_missing_raises(built_index):
    with pytest.raises(DslError, match="needs doc_stats columns"):
        dsl.aggs(built_index, {
            "query": {"match_all": {}},
            "aggs": {"t": {"geotile_grid": {"field": "location"}}},
        })


def test_bucket_script_selector_body(built_index):
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the and"}},
        "aggs": {"roles": {
            "terms": {"field": "role", "size": 10},
            "aggs": {
                "ti_sum": {"sum": {"field": "turn_idx"}},
                "per_doc": {"bucket_script": {
                    "buckets_path": {"s": "ti_sum", "n": "_count"},
                    "script": {"source": "params.s / params.n"},
                }},
                "keep": {"bucket_selector": {
                    "buckets_path": {"n": "_count"},
                    "script": "params.n > 5",
                }},
            },
        }},
    })
    want = built_index.bucket_script(
        "the and", by="role", aggs={"ti_sum": ("sum", "turn_idx")},
        scripts={"per_doc": "ti_sum / doc_count"},
        having="doc_count > 5", k=10,
    )
    assert rows(out["roles"]) == rows(want)


def test_bucket_script_bad_path_raises(built_index):
    with pytest.raises(DslError, match="names no sibling"):
        dsl.aggs(built_index, {
            "query": {"match": {"text": "the"}},
            "aggs": {"roles": {
                "terms": {"field": "role"},
                "aggs": {"x": {"bucket_script": {
                    "buckets_path": {"a": "nope"},
                    "script": "params.a",
                }}},
            }},
        })
    with pytest.raises(DslError, match="references params.z"):
        dsl.aggs(built_index, {
            "query": {"match": {"text": "the"}},
            "aggs": {"roles": {
                "terms": {"field": "role"},
                "aggs": {"x": {"bucket_script": {
                    "buckets_path": {"a": "_count"},
                    "script": "params.z + 1",
                }}},
            }},
        })


def test_rate_sub_agg_body(built_index):
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"r": {"rate": {"unit": "hour"}}},
        }},
    })
    want = built_index.rate_agg("the", on="ts", interval="day", unit="hour")
    assert rows(out["per_day"]) == rows(want)


def test_cumulative_cardinality_body(built_index):
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "convs": {"cardinality": {"field": "conv_id"}},
                "total": {"cumulative_cardinality": {
                    "buckets_path": "convs"}},
            },
        }},
    })
    want = built_index.cumulative_cardinality(
        "the", on="ts", entity="conv_id", interval="day"
    )
    assert rows(out["daily"]) == rows(want)


def test_filter_agg_single(built_index):
    from pyspark.sql import functions as F

    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"assistant_only": {
            "filter": {"term": {"role": "assistant"}},
            "aggs": {"s": {"stats": {"field": "turn_idx"}}},
        }},
    })
    want = built_index.stats_agg(
        "the", on="turn_idx", filters=F.col("role") == "assistant"
    )
    assert rows(out["assistant_only"]) == rows(want)
    # bare filter agg (no sub): a doc_count row
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"n": {"filter": {"term": {"role": "assistant"}}}},
    })
    got = out["n"].collect()[0]["doc_count"]
    want_n = built_index.search({"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "filter": [{"term": {"role": "assistant"}}]}},
        "size": 100000}).count()
    assert got == want_n and got > 0


def test_composite_date_histogram_source(built_index):
    body = {
        "query": {"match": {"text": "the"}},
        "aggs": {"c": {"composite": {
            "size": 1000,
            "sources": [
                {"hr": {"date_histogram": {"field": "ts",
                                           "calendar_interval": "hour"}}},
                {"role": {"terms": {"field": "role"}}},
            ],
        }}},
    }
    full = dsl.aggs(built_index, body)["c"].toPandas()
    assert list(full.columns) == ["hr", "role", "doc_count"]
    keys = list(zip(full["hr"], full["role"]))
    assert keys == sorted(keys) and len(keys) > 6
    # keyset pagination: pages of 5 via after reassemble the full run
    pages = []
    comp = body["aggs"]["c"]["composite"]
    comp["size"] = 5
    comp.pop("after", None)
    while True:
        page = dsl.aggs(built_index, body)["c"].toPandas()
        if len(page) == 0:
            break
        pages.append(page)
        comp["after"] = {"hr": page["hr"].iloc[-1],
                         "role": page["role"].iloc[-1]}
    import pandas as pd

    got = pd.concat(pages, ignore_index=True)
    assert got.values.tolist() == full.values.tolist()


def test_geo_distance_sort(built_index, geo_index):
    got = built_index.search({
        "runtime_mappings": RM,
        "query": {"match": {"text": "the"}},
        "sort": [{"_geo_distance": {
            "location": {"lat": 10.0, "lon": 20.0},
            "order": "asc", "unit": "km",
        }}],
        "size": 5,
    })
    want = geo_index.geo_distance((10.0, 20.0), float("inf"), query="the", k=5)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    assert got.count() == 5
    with pytest.raises(DslError, match="order=asc"):
        built_index.search({
            "runtime_mappings": RM,
            "query": {"match": {"text": "the"}},
            "sort": [{"_geo_distance": {
                "location": {"lat": 0.0, "lon": 0.0}, "order": "desc",
            }}],
        })
