"""ES terms-agg knobs: order (builtins + sub-metric), missing,
min_doc_count — engine behavior vs pandas, DSL bodies vs direct calls."""

from __future__ import annotations

import numpy as np
import pytest

from dart_importer_spark.query import dsl
from dart_importer_spark.query.dsl import DslError
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


def _buckets(src, oracle, terms):
    hits = _match_set(oracle, terms)
    return src[src["doc_id"].isin(hits)].groupby("role").size()


def test_order_key_asc(built_index, src, oracle):
    got = built_index.facet("the", by="role", order=("_key", "asc")).toPandas()
    want = _buckets(src, oracle, ["the"]).sort_index()
    assert list(got["role"]) == list(want.index)
    assert list(got["doc_count"]) == list(want.values)


def test_order_count_asc_applies_before_topk(built_index, src, oracle):
    # ES: ordering happens BEFORE the size cut — count asc k=1 returns
    # the SMALLEST bucket, not the largest
    got = built_index.facet(
        "the", by="role", k=1, order=("_count", "asc")
    ).collect()[0]
    want = _buckets(src, oracle, ["the"]).sort_values()
    assert got["doc_count"] == int(want.iloc[0])


def test_min_doc_count_and_missing(built_index, spark, src, oracle):
    all_b = _buckets(src, oracle, ["the"])
    thresh = int(all_b.max())
    got = built_index.facet("the", by="role", min_doc_count=thresh).toPandas()
    assert list(got["doc_count"]) == [v for v in all_b.values if v >= thresh]
    # missing: nulls bucket under the stand-in (tool column is sparse)
    got = built_index.facet("the", by="tool", missing="__none__", k=100).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    n_null = int(sub["tool"].isna().sum())
    assert int(got.set_index("tool").loc["__none__", "doc_count"]) == n_null
    # without missing, the null bucket is the engine's previous behavior
    # (grouped under NULL) — stand-in only appears when asked
    got2 = built_index.facet("the", by="tool", k=100).toPandas()
    assert "__none__" not in set(got2["tool"].dropna())


def test_facet_stats_order_by_submetric(built_index, src, oracle):
    got = built_index.facet_stats(
        "the", by="role", on="turn_idx", order=("avg", "desc")
    ).toPandas()
    assert list(got["avg"]) == sorted(got["avg"], reverse=True)
    # same buckets as the default ordering, different order
    base = built_index.facet_stats("the", by="role", on="turn_idx").toPandas()
    assert set(got["role"]) == set(base["role"])


def test_order_rejects_bad_direction(built_index):
    with pytest.raises(ValueError, match="asc\\|desc"):
        built_index.facet("the", by="role", order=("_count", "up"))


def test_dsl_terms_order_missing_mdc(built_index):
    def rows(df):
        return [tuple(r) for r in df.collect()]

    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {"terms": {
            "field": "role", "order": {"_key": "desc"},
            "min_doc_count": 2, "missing": "__none__",
        }}},
    })
    want = built_index.facet(
        "the", by="role", order=("_key", "desc"),
        min_doc_count=2, missing="__none__",
    )
    assert rows(out["roles"]) == rows(want)
    # sub-metric ordering: order: {"ti.avg": "asc"} over a stats sub
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {
            "terms": {"field": "role", "order": {"ti.avg": "asc"}},
            "aggs": {"ti": {"stats": {"field": "turn_idx"}}},
        }},
    })
    want = built_index.facet_stats(
        "the", by="role", on="turn_idx", order=("avg", "asc")
    )
    assert rows(out["roles"]) == rows(want)
    # single-value sub named directly
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {
            "terms": {"field": "role", "order": {"m": "desc"}},
            "aggs": {"m": {"max": {"field": "turn_idx"}}},
        }},
    })
    want = built_index.facet_stats(
        "the", by="role", on="turn_idx", order=("max", "desc")
    )
    assert rows(out["roles"]) == rows(want)


def test_dsl_order_unknown_sub_raises(built_index):
    with pytest.raises(DslError, match="names no sub-aggregation"):
        dsl.aggs(built_index, {
            "query": {"match": {"text": "the"}},
            "aggs": {"roles": {
                "terms": {"field": "role", "order": {"zz": "desc"}},
                "aggs": {"m": {"max": {"field": "turn_idx"}}},
            }},
        })


def test_random_sampler(built_index, src, oracle):
    p, seed = 0.5, 11
    got = built_index.random_sampler_agg(
        "the", by="role", probability=p, seed=seed
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    P, A = 1_000_003, 7_919
    cut = int(p * P)
    sub = src[src["doc_id"].isin(hits)]
    sampled = sub[((sub["doc_id"] + seed) % P * A % P) < cut]
    want = sampled.groupby("role").size()
    got_i = got.set_index("role")["sampled_count"]
    assert got_i.to_dict() == want.to_dict()
    assert (got["doc_count"] == (got["sampled_count"] / p).round()).all()
    # fraction sampled is near p
    assert abs(len(sampled) / len(sub) - p) < 0.05
    with pytest.raises(ValueError, match="probability"):
        built_index.random_sampler_agg("the", by="role", probability=0.0)


def test_random_sampler_dsl(built_index):
    from dart_importer_spark.query import dsl as _dsl

    out = _dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"s": {
            "random_sampler": {"probability": 0.5, "seed": 11},
            "aggs": {"roles": {"terms": {"field": "role"}}},
        }},
    })
    want = built_index.random_sampler_agg(
        "the", by="role", probability=0.5, seed=11
    )
    assert [tuple(r) for r in out["s"].collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_facet_nested(built_index, src, oracle):
    got = built_index.facet_nested(
        "the", by="role", then_by="tool", k=3, k_inner=2
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    pairs = sub.groupby(["role", "tool"], dropna=False).size().reset_index(name="n")
    outer = sub.groupby("role").size().sort_values(ascending=False)
    want = []
    for role in sorted(outer.index, key=lambda r: (-outer[r], r))[:3]:
        inner = pairs[pairs.role == role].sort_values(
            ["n", "tool"], ascending=[False, True], na_position="last"
        ).head(2)
        for r in inner.itertuples():
            want.append((role, int(outer[role]),
                         None if r.tool != r.tool else r.tool, int(r.n)))
    got_t = [
        (r.role, int(r.outer_count), r.tool, int(r.doc_count))
        for r in got.itertuples()
    ]
    assert got_t == want
    # inner counts sum to <= outer count; each parent has <= k_inner rows
    per = got.groupby("role").size()
    assert (per <= 2).all()


def test_facet_nested_dsl_and_bucket_corr(built_index):
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {
            "terms": {"field": "role", "size": 3},
            "aggs": {"tools": {"terms": {"field": "tool", "size": 2}}},
        }},
    })
    want = built_index.facet_nested("the", by="role", then_by="tool", k=3, k_inner=2)
    assert [tuple(r) for r in out["roles"].collect()] == [
        tuple(r) for r in want.collect()
    ]
    out = dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {
                "m": {"sum": {"field": "turn_idx"}},
                "c": {"bucket_correlation": {"buckets_path": "m"}},
            },
        }},
    })
    want = built_index.bucket_correlation(
        "the", on="ts", value="turn_idx", interval="hour"
    )
    assert [tuple(r) for r in out["daily"].collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_bucket_correlation_value(built_index, src, oracle):
    import numpy as np

    got = built_index.bucket_correlation(
        "the", on="ts", value="turn_idx", interval="hour"
    ).collect()[0]
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)].copy()
    sub["bucket"] = sub["ts"].dt.floor("h")
    g = sub.groupby("bucket").agg(n=("doc_id", "size"), m=("turn_idx", "sum"))
    want = round(float(np.corrcoef(g["n"], g["m"])[0, 1]), 6)
    assert got["correlation"] == pytest.approx(want)
    assert got["n_buckets"] == len(g)


def test_date_terms_nested(built_index, src, oracle):
    got = built_index.date_terms_nested(
        "the", on="ts", then_by="role", interval="hour", k_inner=2
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)].copy()
    sub["bucket"] = sub["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
    want = []
    for b in sorted(sub["bucket"].unique()):
        g = sub[sub["bucket"] == b]
        inner = g.groupby("role").size().reset_index(name="n").sort_values(
            ["n", "role"], ascending=[False, True]
        ).head(2)
        for r in inner.itertuples():
            want.append((b, len(g), r.role, int(r.n)))
    got_t = [
        (r.bucket, int(r.outer_count), r.role, int(r.doc_count))
        for r in got.itertuples()
    ]
    assert got_t == want

    from dart_importer_spark.query import dsl as _dsl

    out = _dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"hourly": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"roles": {"terms": {"field": "role", "size": 2}}},
        }},
    })
    assert [tuple(r) for r in out["hourly"].collect()] == got_t


def test_pipeline_over_metric_series(built_index, src, oracle):
    got = built_index.date_histogram_pipeline(
        "the", on="ts", interval="hour", window=2, value="turn_idx"
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)].copy()
    sub["bucket"] = sub["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
    g = sub.groupby("bucket")["turn_idx"].sum().sort_index()
    assert list(got["metric"]) == list(g.values)
    assert list(got["cum_count"]) == list(g.cumsum().values)
    deriv = [None] + [float(b - a) for a, b in zip(g.values, g.values[1:])]
    got_d = [None if d != d else d for d in got["derivative"]]
    assert got_d == pytest.approx(deriv)
    mov = [round(float(sum(g.values[max(0, i - 1): i + 1]) /
                       len(g.values[max(0, i - 1): i + 1])), 6)
           for i in range(len(g))]
    assert list(got["moving_avg"]) == pytest.approx(mov)

    from dart_importer_spark.query import dsl as _dsl

    out = _dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"hourly": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {
                "m": {"sum": {"field": "turn_idx"}},
                "d": {"derivative": {"buckets_path": "m"}},
                "mv": {"moving_fn": {"buckets_path": "m", "window": 2}},
            },
        }},
    })
    assert [tuple(r) for r in out["hourly"].collect()] == [
        tuple(r) for r in built_index.date_histogram_pipeline(
            "the", on="ts", interval="hour", window=2, value="turn_idx"
        ).collect()
    ]


def test_top_hits_per_date_bucket(built_index, src, oracle):
    got = built_index.top_hits(
        "the", by="ts", size=2, interval="hour", round_scores=6
    ).toPandas()
    # per-bucket membership: each bucket's hits are the 2 best-scoring
    # docs whose ts falls in it (scores from the engine's own topk)
    all_hits = built_index.topk("the", k=100000, round_scores=6).toPandas()
    m = src.set_index("doc_id")["ts"]
    all_hits["bucket"] = (
        all_hits["doc_id"].map(m).dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
    )
    for b, g in all_hits.groupby("bucket"):
        want = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(2)
        gb = got[got["bucket"] == b]
        assert list(gb["doc_id"]) == list(want["doc_id"])
        assert list(gb["rank"]) == list(range(1, len(want) + 1))

    from dart_importer_spark.query import dsl as _dsl

    out = _dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"best": {"top_hits": {"size": 2}}},
        }},
    })
    assert sorted(tuple(r) for r in out["daily"].collect()) == sorted(
        tuple(r) for r in built_index.top_hits(
            "the", by="ts", size=2, interval="hour"
        ).collect()
    )


def test_facet_percentiles(built_index, src, oracle):
    import numpy as np

    got = built_index.facet_percentiles(
        "the", by="role", on="turn_idx", percents=(25.0, 50.0, 90.0)
    ).toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    outer = sub.groupby("role").size().sort_values(ascending=False)
    want = []
    for role in sorted(outer.index, key=lambda r: (-outer[r], r)):
        vals = sub[sub["role"] == role]["turn_idx"].to_numpy(dtype=float)
        for p in (25.0, 50.0, 90.0):
            want.append((role, int(outer[role]), p,
                         round(float(np.percentile(vals, p)), 6)))
    got_t = [
        (r.role, int(r.doc_count), float(r.percent), float(r.value))
        for r in got.itertuples()
    ]
    assert got_t == pytest.approx(want)

    from dart_importer_spark.query import dsl as _dsl

    out = _dsl.aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"roles": {
            "terms": {"field": "role"},
            "aggs": {"lat": {"percentiles": {
                "field": "turn_idx", "percents": [25, 50, 90]}}},
        }},
    })
    assert [tuple(r) for r in out["roles"].collect()] == [
        tuple(r) for r in built_index.facet_percentiles(
            "the", by="role", on="turn_idx", percents=(25.0, 50.0, 90.0)
        ).collect()
    ]
