"""ip_range aggregation (IPv4 buckets: from/to + CIDR masks, runtime-field
sourced) and extended_stats_bucket (extended stats OF a date_histogram's
doc_counts) — both checked against small hand-computed oracles."""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.dsl import aggs
from dart_importer_spark.query.engine import InvertedIndex

ROWS = [
    # (conv_id, turn_idx, text, ts, ip)
    ("c1", 0, "a b", datetime(2024, 1, 1, 5), "10.0.0.5"),
    ("c1", 1, "a",   datetime(2024, 1, 1, 9), "10.0.0.200"),
    ("c2", 0, "a b", datetime(2024, 1, 2, 5), "10.0.1.7"),
    ("c2", 1, "b",   datetime(2024, 1, 2, 6), "192.168.1.1"),
    ("c3", 0, "a",   datetime(2024, 1, 2, 7), "not-an-ip"),
    ("c3", 1, "a b", datetime(2024, 1, 4, 1), "10.0.0.128"),
]


@pytest.fixture(scope="module")
def ip_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string, ts timestamp, "
              "ip string"
    )
    out = str(tmp_path_factory.mktemp("iprange") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("ts", "ip"),
    )
    return InvertedIndex(spark, out)


def test_ip_range_from_to_and_mask(ip_index):
    got = {
        r["key"]: r["doc_count"]
        for r in ip_index.ip_range_agg(
            None, "ip",
            [
                {"to": "10.0.0.128"},                      # 10.0.0.5 only
                {"from": "10.0.0.128", "to": "10.0.2.0"},  # .200 .1.7 .128
                {"mask": "10.0.0.0/24", "key": "net24"},   # .5 .200 .128
                {"mask": "192.168.1.1/32", "key": "one"},  # exactly 1
                {"from": "11.0.0.0"},                      # 192.168.1.1
            ],
        ).collect()
    }
    assert got == {
        "*-10.0.0.128": 1,
        "10.0.0.128-10.0.2.0": 3,
        "net24": 3,
        "one": 1,
        "11.0.0.0-*": 1,
    }


def test_ip_range_query_scoped_and_invalid_ips(ip_index):
    # query "b" matches docs 0,2,3,5 — the non-IP doc 4 is excluded anyway;
    # doc 1 (10.0.0.200) leaves net24
    got = {
        r["key"]: r["doc_count"]
        for r in ip_index.ip_range_agg(
            "b", "ip", [{"mask": "10.0.0.0/24", "key": "net24"}]
        ).collect()
    }
    assert got == {"net24": 2}  # 10.0.0.5 + 10.0.0.128


def test_ip_range_mask_normalizes_host_bits(ip_index):
    # a mask given off a host address still buckets its whole network
    a = ip_index.ip_range_agg(
        None, "ip", [{"mask": "10.0.0.77/24", "key": "k"}]
    ).collect()[0]["doc_count"]
    b = ip_index.ip_range_agg(
        None, "ip", [{"mask": "10.0.0.0/24", "key": "k"}]
    ).collect()[0]["doc_count"]
    assert a == b == 3


def test_ip_range_guards(ip_index):
    with pytest.raises(ValueError, match="at least one range"):
        ip_index.ip_range_agg(None, "ip", [])
    with pytest.raises(ValueError, match="bad IPv4"):
        ip_index.ip_range_agg(None, "ip", [{"from": "10.0.0"}])
    with pytest.raises(ValueError, match="bad mask length"):
        ip_index.ip_range_agg(None, "ip", [{"mask": "10.0.0.0/40"}])


def test_ip_range_dsl_with_runtime_field(ip_index):
    # ES runtime_mappings: derive the ip at query time, bucket on it
    out = aggs(ip_index, {
        "runtime_mappings": {
            "ip2": {"type": "keyword", "script": "concat('10.0.0.', '5')"},
        },
        "aggs": {"nets": {"ip_range": {
            "field": "ip2",
            "ranges": [{"mask": "10.0.0.0/24", "key": "all"}],
        }}},
    })["nets"].collect()
    assert {r["key"]: r["doc_count"] for r in out} == {"all": len(ROWS)}


def test_extended_stats_bucket_oracle(ip_index):
    # day buckets of match_all? extended_stats_bucket takes a query — use
    # "a" (docs 0,1,2,4,5): days 1/1=2, 1/2=2, 1/4=1
    row = ip_index.extended_stats_bucket("a", on="ts", interval="day").collect()[0]
    series = [2, 2, 1]
    n = len(series)
    avg = sum(series) / n
    var = sum((x - avg) ** 2 for x in series) / n  # population, like ES
    assert row["count"] == n
    assert row["min"] == 1 and row["max"] == 2
    assert row["sum"] == 5 and row["sum_of_squares"] == 9
    assert abs(row["avg"] - round(avg, 6)) < 1e-9
    assert abs(row["variance"] - round(var, 6)) < 1e-9
    assert abs(row["std_deviation"] - round(math.sqrt(var), 6)) < 1e-9
    assert abs(row["std_upper"] - round(avg + 2 * math.sqrt(var), 6)) < 1e-9
    assert abs(row["std_lower"] - round(avg - 2 * math.sqrt(var), 6)) < 1e-9


def test_extended_stats_bucket_dsl(ip_index):
    out = aggs(ip_index, {
        "query": {"match": {"text": "a"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"es": {"extended_stats_bucket": {
                "buckets_path": "per_day>_count", "sigma": 1.0,
            }}},
        }},
    })["per_day"].collect()[0]
    assert out["count"] == 3 and out["sum"] == 5
    # sigma=1 bounds (engine rounds AFTER the bound math; avg/sd here are
    # the already-rounded outputs, so allow their rounding slack)
    avg, sd = out["avg"], out["std_deviation"]
    assert abs(out["std_upper"] - (avg + sd)) < 5e-6
    assert abs(out["std_lower"] - (avg - sd)) < 5e-6

# ---------------------------------------------------------------------------
# ip_prefix aggregation (same fixture: 5 valid IPv4 docs + 1 invalid)
# ---------------------------------------------------------------------------

def test_ip_prefix_basic(ip_index):
    out = ip_index.ip_prefix_agg(None, "ip", 24).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("10.0.0.0", 3), ("10.0.1.0", 1), ("192.168.1.0", 1)]


def test_ip_prefix_options(ip_index):
    out = ip_index.ip_prefix_agg(
        None, "ip", 24, append_prefix_length=True, min_doc_count=2
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("10.0.0.0/24", 3)]
    out16 = ip_index.ip_prefix_agg(None, "ip", 16).collect()
    assert [(r["key"], r["doc_count"]) for r in out16] == [
        ("10.0.0.0", 4), ("192.168.0.0", 1)]
    # /32: every distinct valid ip is its own bucket, ADDRESS-ordered
    # (10.0.0.128 before 10.0.0.5 would be string order — must not happen)
    out32 = ip_index.ip_prefix_agg(None, "ip", 32).collect()
    assert [(r["key"], r["doc_count"]) for r in out32] == [
        ("10.0.0.5", 1), ("10.0.0.128", 1), ("10.0.0.200", 1),
        ("10.0.1.7", 1), ("192.168.1.1", 1)]
    # /0 collapses every valid ip into 0.0.0.0; the invalid one still drops
    out0 = ip_index.ip_prefix_agg(None, "ip", 0).collect()
    assert [(r["key"], r["doc_count"]) for r in out0] == [("0.0.0.0", 5)]


def test_ip_prefix_query_scoped_and_guards(ip_index):
    out = ip_index.ip_prefix_agg("b", "ip", 24).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("10.0.0.0", 2), ("10.0.1.0", 1), ("192.168.1.0", 1)]
    with pytest.raises(ValueError, match="prefix_length"):
        ip_index.ip_prefix_agg(None, "ip", 33)


def test_ip_prefix_dsl(ip_index):
    from dart_importer_spark.query.dsl import DslError

    out = aggs(ip_index, {
        "aggs": {"nets": {"ip_prefix": {"field": "ip", "prefix_length": 24}}},
    })["nets"].collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("10.0.0.0", 3), ("10.0.1.0", 1), ("192.168.1.0", 1)]
    with pytest.raises(DslError, match="prefix_length is required"):
        aggs(ip_index, {"aggs": {"n": {"ip_prefix": {"field": "ip"}}}})


# ---------------------------------------------------------------------------
# bucket_count_ks_test (query "a" day buckets: [2, 2, 1], n=5)
# ---------------------------------------------------------------------------

def test_ks_test_two_sided_uniform(ip_index):
    row = ip_index.bucket_count_ks_test("a", on="ts", interval="day").collect()[0]
    # e = [.4, .8, 1], f = [1/3, 2/3, 1] -> D = 2/15
    assert row["n_buckets"] == 3 and row["n"] == 5
    assert abs(row["statistic"] - round(2 / 15, 6)) < 1e-9
    d = 2 / 15
    lam = (math.sqrt(5) + 0.12 + 0.11 / math.sqrt(5)) * d
    p = min(1.0, 2 * sum(
        (-1.0) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
        for j in range(1, 101)
    ))
    assert abs(row["p_value"] - round(p, 6)) < 1e-9


def test_ks_test_one_sided_and_perfect_fit(ip_index):
    d = 2 / 15
    row = ip_index.bucket_count_ks_test(
        "a", on="ts", interval="day", alternative="greater"
    ).collect()[0]
    assert abs(row["statistic"] - round(d, 6)) < 1e-9
    assert abs(row["p_value"] - round(math.exp(-2 * 5 * d * d), 6)) < 1e-9
    # fractions equal to the empirical distribution (normalized): D=0, p=1
    perfect = ip_index.bucket_count_ks_test(
        "a", on="ts", interval="day", fractions=[2, 2, 1]
    ).collect()[0]
    assert perfect["statistic"] == 0.0 and perfect["p_value"] == 1.0


def test_ks_test_guards_and_dsl(ip_index):
    from dart_importer_spark.query.dsl import DslError

    with pytest.raises(ValueError, match="alternative"):
        ip_index.bucket_count_ks_test("a", on="ts", alternative="both")
    with pytest.raises(ValueError, match="fractions for"):
        ip_index.bucket_count_ks_test("a", on="ts", fractions=[0.5, 0.5])
    with pytest.raises(ValueError, match="positive sum"):
        ip_index.bucket_count_ks_test("a", on="ts", fractions=[0, 0, 0])
    out = aggs(ip_index, {
        "query": {"match": {"text": "a"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"ks": {"bucket_count_ks_test": {
                "buckets_path": "per_day>_count",
                "alternative": ["less"],
            }}},
        }},
    })["per_day"].collect()[0]
    # less: D = max(f - e) = 0 on this series -> p = 1
    assert out["statistic"] == 0.0 and out["p_value"] == 1.0
    with pytest.raises(DslError, match="exactly one alternative"):
        aggs(ip_index, {
            "aggs": {"per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"ks": {"bucket_count_ks_test": {
                    "buckets_path": "p>_count", "alternative": ["less", "greater"],
                }}},
            }},
        })
