"""bucket_script/bucket_selector, rate, cumulative_cardinality pipeline
aggs and the geo family (geo_distance / geo_bounding_box / geotile_grid /
geo_centroid over runtime-field coordinates) — each checked against a
pandas recomputation of the same match set."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.oracle import BM25Oracle


@pytest.fixture(scope="module")
def src(transcripts_pdf):
    s = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    s["doc_id"] = np.arange(len(s), dtype=np.int64)
    return s


@pytest.fixture(scope="module")
def oracle(src):
    return BM25Oracle(src)


def _match_set(oracle, terms):
    return {
        int(did)
        for did, toks in zip(oracle.doc_ids, oracle.tokens)
        if any(t in toks for t in terms)
    }


# -- pipeline aggs -----------------------------------------------------


def test_bucket_script_and_selector(built_index, src, oracle):
    got = built_index.bucket_script(
        "the and",
        by="role",
        aggs={"ti_sum": ("sum", "turn_idx"), "ti_max": ("max", "turn_idx")},
        scripts={"per_doc": "ti_sum / doc_count"},
        having="doc_count > 5",
        k=10,
    ).toPandas()
    hits = _match_set(oracle, ["the", "and"])
    sub = src[src["doc_id"].isin(hits)]
    want = (
        sub.groupby("role")
        .agg(
            doc_count=("doc_id", "size"),
            ti_sum=("turn_idx", "sum"),
            ti_max=("turn_idx", "max"),
        )
        .reset_index()
        .sort_values(["doc_count", "role"], ascending=[False, True])
        .head(10)
    )
    want["per_doc"] = (want.ti_sum / want.doc_count).round(6)
    want = want[want.doc_count > 5]
    assert list(got["role"]) == list(want["role"])
    assert list(got["doc_count"]) == list(want["doc_count"])
    assert list(got["ti_sum"]) == list(want["ti_sum"])
    assert list(got["per_doc"]) == pytest.approx(list(want["per_doc"]))


def test_bucket_selector_never_promotes(built_index):
    # ES order of operations: top-k buckets are chosen BEFORE the
    # selector — k=1 + a selector killing that bucket yields 0 rows,
    # not the runner-up bucket
    full = built_index.bucket_script("the", by="role", aggs={}, k=1).toPandas()
    top_count = int(full.doc_count.iloc[0])
    got = built_index.bucket_script(
        "the", by="role", aggs={}, having=f"doc_count < {top_count}", k=1
    ).toPandas()
    assert len(got) == 0


def test_bucket_script_rejects_unknown_fn(built_index):
    with pytest.raises(ValueError, match="unsupported agg fns"):
        built_index.bucket_script("the", by="role", aggs={"x": ("median", "turn_idx")})


def test_rate_day_per_hour(built_index, src, oracle):
    got = built_index.rate_agg("the", on="ts", interval="day", unit="hour").toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    want = (
        sub["ts"].dt.floor("D").dt.strftime("%Y-%m-%d %H:%M:%S")
        .value_counts().sort_index()
    )
    assert list(got["bucket"]) == list(want.index)
    assert list(got["rate"]) == pytest.approx([round(v / 24.0, 6) for v in want.values])


def test_rate_month_per_day_calendar_aware(built_index, src, oracle):
    import calendar

    got = built_index.rate_agg(
        "the", on="ts", interval="month", unit="day"
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    per_month = (
        sub["ts"].dt.to_period("M").value_counts().sort_index()
    )
    want = [
        round(v / calendar.monthrange(p.year, p.month)[1], 6)
        for p, v in per_month.items()
    ]
    assert list(got["rate"]) == pytest.approx(want)


def test_rate_rejects_bad_pair(built_index):
    with pytest.raises(ValueError, match="unsupported interval/unit"):
        built_index.rate_agg("the", on="ts", interval="hour", unit="day")


def test_cumulative_cardinality(built_index, src, oracle):
    got = built_index.cumulative_cardinality(
        "the", on="ts", entity="conv_id", interval="day"
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)].copy()
    sub["bucket"] = sub["ts"].dt.floor("D").dt.strftime("%Y-%m-%d %H:%M:%S")
    buckets = sorted(sub["bucket"].unique())
    seen: set = set()
    want = []
    for b in buckets:
        seen |= set(sub[sub["bucket"] == b]["conv_id"])
        want.append(len(seen))
    assert list(got["bucket"]) == buckets
    assert list(got["cum_cardinality"]) == want
    # monotone non-decreasing by construction
    assert all(a <= b for a, b in zip(want, want[1:]))


# -- geo family --------------------------------------------------------

LAT = "CAST(-59.5 + (doc_id*7 % 120) AS DOUBLE)"
LON = "CAST(-169.5 + (doc_id*13 % 340) AS DOUBLE)"


@pytest.fixture(scope="module")
def geo_index(built_index):
    return built_index.with_runtime_fields({"lat": LAT, "lon": LON})


def _coords(doc_ids):
    return {
        d: (-59.5 + (d * 7 % 120), -169.5 + (d * 13 % 340)) for d in doc_ids
    }


def _hav_km(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1) / 2
    dlmb = math.radians(lon2 - lon1) / 2
    a = (
        math.sin(dphi) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlmb) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def test_geo_distance_matches_python(geo_index, src, oracle):
    got = geo_index.geo_distance((10.0, 20.0), 3000.0, query="the").toPandas()
    hits = _match_set(oracle, ["the"])
    want = sorted(
        (round(_hav_km(10.0, 20.0, la, lo), 6), d)
        for d, (la, lo) in _coords(hits).items()
        if round(_hav_km(10.0, 20.0, la, lo), 6) <= 3000.0
    )
    assert [(r.distance_km, r.doc_id) for r in got.itertuples()] == pytest.approx(
        [(dist, d) for dist, d in want]
    )
    assert len(got) > 0


def test_geo_bounding_box(geo_index, src, oracle):
    got = geo_index.geo_bounding_box((40.0, -60.0), (-20.0, 80.0), query="the").toPandas()
    hits = _match_set(oracle, ["the"])
    want = sorted(
        d
        for d, (la, lo) in _coords(hits).items()
        if -20.0 <= la <= 40.0 and -60.0 <= lo <= 80.0
    )
    assert list(got["doc_id"]) == want
    assert len(got) > 0
    with pytest.raises(ValueError, match="dateline"):
        geo_index.geo_bounding_box((40.0, 100.0), (-20.0, -100.0))


def test_geotile_grid(geo_index, src, oracle):
    z = 3
    got = geo_index.geotile_grid(z, query="the", k=1000).toPandas()
    hits = _match_set(oracle, ["the"])
    n = 2 ** z
    from collections import Counter

    c: Counter = Counter()
    for d, (la, lo) in _coords(hits).items():
        x = min(n - 1, max(0, int(math.floor((lo + 180.0) / 360.0 * n))))
        phi = math.radians(la)
        y = min(
            n - 1,
            max(
                0,
                int(
                    math.floor(
                        (1 - math.log(math.tan(phi) + 1 / math.cos(phi)) / math.pi)
                        / 2
                        * n
                    )
                ),
            ),
        )
        c[f"{z}/{x}/{y}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.tile, r.doc_count) for r in got.itertuples()] == want


def test_geo_centroid(geo_index, src, oracle):
    got = geo_index.geo_centroid(query="the").collect()[0]
    hits = _match_set(oracle, ["the"])
    lats = [la for la, _ in _coords(hits).values()]
    lons = [lo for _, lo in _coords(hits).values()]
    assert got["lat"] == pytest.approx(round(sum(lats) / len(lats), 6))
    assert got["lon"] == pytest.approx(round(sum(lons) / len(lons), 6))
    assert got["doc_count"] == len(hits)


def test_geo_pushdown_no_python(spark, geo_index):
    # geo predicates are Catalyst expressions over the doc_stats scan —
    # never a Python UDF
    plan = geo_index.geo_distance(
        (0.0, 0.0), 5000.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_moving_percentiles(built_index, src, oracle):
    import numpy as np

    got = built_index.moving_percentiles(
        "the", on="ts", value="turn_idx", percent=50.0, interval="day",
        window=2,
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)].copy()
    sub["bucket"] = sub["ts"].dt.floor("D").dt.strftime("%Y-%m-%d %H:%M:%S")
    buckets = sorted(sub["bucket"].unique())
    for r in got.itertuples():
        i = buckets.index(r.bucket)
        win = buckets[max(0, i - 1): i + 1]
        vals = sub[sub["bucket"].isin(win)]["turn_idx"].to_numpy(dtype=float)
        want = round(float(np.percentile(vals, 50.0)), 6)
        assert r.value == pytest.approx(want)
        assert r.doc_count == int((sub["bucket"] == r.bucket).sum())
    assert list(got["bucket"]) == buckets
    with pytest.raises(ValueError, match="window"):
        built_index.moving_percentiles("the", on="ts", value="turn_idx", window=0)


# -- geohash_grid / geo_bounds / date_range ------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_py(lat, lon, precision):
    """Classic bisection geohash — the independent reference encoder."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    bit_count = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(_GH32[bits])
            bits, bit_count = 0, 0
    return "".join(out)


def test_geohash_col_matches_reference_encoder(spark):
    from dart_importer_spark.query.engine import InvertedIndex
    from pyspark.sql import functions as F

    pts = [
        (57.64911, 10.40744),   # the canonical u4pruydqqvj example
        (0.0, 0.0),
        (-89.9, -179.9),
        (89.9, 179.9),
        (37.7749, -122.4194),
        (-33.8688, 151.2093),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 3, 5, 11):
        got = [
            r["g"]
            for r in df.select(
                InvertedIndex.geohash_col(F.col("lat"), F.col("lon"), p).alias("g")
            ).collect()
        ]
        want = [_geohash_py(la, lo, p) for la, lo in pts]
        assert got == want, f"precision {p}"
    assert _geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"


def test_geohash_grid(geo_index, src, oracle):
    from collections import Counter

    got = geo_index.geohash_grid(2, query="the", k=1000).toPandas()
    hits = _match_set(oracle, ["the"])
    c: Counter = Counter()
    for d, (la, lo) in _coords(hits).items():
        c[_geohash_py(la, lo, 2)] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.geohash, r.doc_count) for r in got.itertuples()] == want


def test_geo_bounds(geo_index, src, oracle):
    got = geo_index.geo_bounds(query="the").collect()[0]
    hits = _match_set(oracle, ["the"])
    lats = [la for la, _ in _coords(hits).values()]
    lons = [lo for _, lo in _coords(hits).values()]
    assert got["top_left_lat"] == max(lats)
    assert got["top_left_lon"] == min(lons)
    assert got["bottom_right_lat"] == min(lats)
    assert got["bottom_right_lon"] == max(lons)
    assert got["doc_count"] == len(hits)


def test_date_range_agg(built_index, src, oracle):
    got = built_index.date_range_agg(
        "the",
        on="ts",
        ranges=[
            (None, "2024-01-01 03:00:00"),
            ("2024-01-01 03:00:00", "2024-01-01 06:00:00"),
            ("2024-01-01 06:00:00", None),
        ],
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    import pandas as pd

    lo1 = pd.Timestamp("2024-01-01 03:00:00")
    lo2 = pd.Timestamp("2024-01-01 06:00:00")
    want = [
        int((sub["ts"] < lo1).sum()),
        int(((sub["ts"] >= lo1) & (sub["ts"] < lo2)).sum()),
        int((sub["ts"] >= lo2).sum()),
    ]
    assert list(got["doc_count"]) == want
    assert sum(want) == len(sub)  # partition: ranges cover the axis


def test_geo_and_range_dsl_bodies(geo_index, built_index):
    from dart_importer_spark.query import dsl
    from dart_importer_spark.query.dsl import DslError

    out = dsl.aggs(geo_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {
            "box": {"geo_bounds": {"field": "location"}},
            "grid": {"geohash_grid": {"field": "location",
                                      "precision": 2, "size": 5}},
        },
    })
    box = out["box"].collect()[0]
    assert box["top_left_lat"] >= box["bottom_right_lat"]
    gh = out["grid"].toPandas()
    assert len(gh) == 5 and gh["doc_count"].is_monotonic_decreasing
    dr = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"spans": {"date_range": {
            "field": "ts",
            "ranges": [{"to": "2024-01-01 03:00:00"},
                       {"from": "2024-01-01 03:00:00"}],
        }}},
    })["spans"].toPandas()
    assert len(dr) == 2 and dr["doc_count"].sum() > 0
    import pytest as _pt

    with _pt.raises(DslError, match="wrap_longitude"):
        dsl.aggs(geo_index, {
            "query": {"match": {"text": "the"}},
            "aggs": {"box": {"geo_bounds": {"field": "location",
                                            "wrap_longitude": True}}},
        })
