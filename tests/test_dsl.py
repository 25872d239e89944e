"""ES ``_search`` request-body dispatcher: every body must compile to
exactly the plan the equivalent direct engine call emits — checked by
row-for-row equality against that call (the engine methods themselves are
oracle-verified; the dispatcher's job is faithful translation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.dsl import DslError
from dart_importer_spark.query import dsl


def rows(df):
    return [tuple(r) for r in df.collect()]


def same(got, want):
    assert rows(got) == rows(want)


# --------------------------------------------------------------------------
# scoring leaves
# --------------------------------------------------------------------------
def test_match(built_index):
    body = {"query": {"match": {"text": "the and"}}, "size": 15}
    same(built_index.search(body, round_scores=6),
         built_index.topk("the and", k=15, round_scores=6))


def test_match_operator_and_msm(built_index):
    same(
        built_index.search(
            {"query": {"match": {"text": {
                "query": "the and", "operator": "and"}}}}
        ),
        built_index.topk("the and", k=10, mode="and"),
    )
    same(
        built_index.search(
            {"query": {"match": {"text": {
                "query": "the and data", "minimum_should_match": 2}}}}
        ),
        built_index.topk("the and data", k=10, min_should_match=2),
    )


def test_match_boost(built_index):
    same(
        built_index.search(
            {"query": {"match": {"text": {"query": "the", "boost": 2.5}}}}
        ),
        built_index.topk("the", k=10, boosts={"the": 2.5}),
    )


def test_term_on_indexed_field_scores(built_index):
    same(
        built_index.search({"query": {"term": {"text": "data"}}}),
        built_index.topk("data", k=10),
    )


def test_term_on_meta_column_is_filter(built_index):
    # the reference's documented term-query shape (Running-ELK.md:287-291)
    got = built_index.search(
        {"query": {"term": {"role": "user", "boost": 1.0}}, "size": 50}
    )
    want = (
        built_index.doc_stats()
        .filter(F.col("role") == "user")
        .select("doc_id")
        .withColumn("score", F.lit(1.0))
        .orderBy("doc_id")
        .limit(50)
    )
    same(got, want)


def test_match_all_and_size(built_index):
    got = built_index.search({"query": {"match_all": {}}, "size": 7})
    assert [r["score"] for r in got.collect()] == [1.0] * 7
    assert [r["doc_id"] for r in got.collect()] == list(range(7))


def test_wildcard_prefix_fuzzy_regexp(built_index):
    same(built_index.search(
            {"query": {"wildcard": {"text": {"value": "th*"}}}, "size": 30}),
         built_index.wildcard("th", k=30))
    same(built_index.search({"query": {"prefix": {"text": "th"}}, "size": 30}),
         built_index.wildcard("th", k=30))
    # non-prefix wildcard pattern routes through regexp
    same(built_index.search(
            {"query": {"wildcard": {"text": "t?e"}}, "size": 30}),
         built_index.regexp("t.e", k=30))
    same(built_index.search(
            {"query": {"fuzzy": {"text": {
                "value": "thw", "fuzziness": 1, "prefix_length": 1}}},
             "size": 30}),
         built_index.fuzzy("thw", k=30, max_dist=1, prefix_length=1))
    same(built_index.search(
            {"query": {"regexp": {"text": {"value": "th[a-z]+"}}},
             "size": 30}),
         built_index.regexp("th[a-z]+", k=30))


def test_terms_query(built_index):
    same(
        built_index.search(
            {"query": {"terms": {"text": ["data", "tool"]}}, "size": 25}
        ),
        built_index.terms_query(["data", "tool"], k=25),
    )


def test_query_string_family(built_index):
    same(
        built_index.search(
            {"query": {"query_string": {
                "query": "(the AND data) OR tool"}}, "size": 12},
            round_scores=6,
        ),
        built_index.query_string(
            "(the AND data) OR tool", k=12, round_scores=6
        ),
    )
    same(
        built_index.search(
            {"query": {"simple_query_string": {
                "query": "the data -tool", "default_operator": "AND"}}},
            round_scores=6,
        ),
        built_index.simple_query_string(
            "the data -tool", k=10, default_operator="and", round_scores=6
        ),
    )


def test_more_like_this(built_index):
    seed = "the user asks about data and the tool output"
    same(
        built_index.search(
            {"query": {"more_like_this": {
                "like": seed, "min_term_freq": 1, "min_doc_freq": 2}}},
            round_scores=6,
        ),
        built_index.more_like_this(
            seed, k=10, min_term_freq=1, min_doc_freq=2, round_scores=6
        ),
    )


def test_function_score_forms(built_index):
    same(
        built_index.search(
            {"query": {"function_score": {
                "query": {"match": {"text": "the"}},
                "field_value_factor": {
                    "field": "dl", "modifier": "log1p", "factor": 2.0},
                "boost_mode": "multiply"}}},
            round_scores=6,
        ),
        built_index.function_score(
            "the", k=10, factor_col="dl", modifier="log1p", factor=2.0,
            round_scores=6,
        ),
    )
    same(
        built_index.search(
            {"query": {"function_score": {
                "query": {"match": {"text": "the"}},
                "functions": [{"gauss": {"turn_idx": {
                    "origin": 0, "scale": 5}}}]}}},
            round_scores=6,
        ),
        built_index.decay_score(
            "the", k=10, on="turn_idx", origin=0.0, scale=5.0,
            fn="gauss", round_scores=6,
        ),
    )
    same(
        built_index.search(
            {"query": {"function_score": {
                "query": {"match": {"text": "the"}},
                "random_score": {"seed": 7}}}},
        ),
        built_index.random_score("the", seed=7, k=10),
    )


def test_boosting(built_index):
    same(
        built_index.search(
            {"query": {"boosting": {
                "positive": {"match": {"text": "the"}},
                "negative": {"match": {"text": "tool"}},
                "negative_boost": 0.4}}},
            round_scores=6,
        ),
        built_index.boosting(
            "the", "tool", negative_boost=0.4, k=10, round_scores=6
        ),
    )


def test_constant_score_ids_exists_range(built_index):
    got = built_index.search(
        {"query": {"constant_score": {
            "filter": {"term": {"role": "user"}}, "boost": 3.0}},
         "size": 5}
    )
    r = got.collect()
    assert all(x["score"] == 3.0 for x in r) and len(r) == 5
    same(
        built_index.search({"query": {"ids": {"values": [3, 1, 8]}}}),
        built_index.doc_stats().filter(F.col("doc_id").isin([1, 3, 8]))
        .select("doc_id").withColumn("score", F.lit(1.0)).orderBy("doc_id"),
    )
    got = built_index.search(
        {"query": {"range": {"turn_idx": {"gte": 2, "lt": 4}}}, "size": 500}
    )
    want = (
        built_index.doc_stats()
        .filter((F.col("turn_idx") >= 2) & (F.col("turn_idx") < 4))
        .select("doc_id").withColumn("score", F.lit(1.0)).orderBy("doc_id")
        .limit(500)
    )
    same(got, want)
    n_exists = built_index.search(
        {"query": {"exists": {"field": "tool"}}, "size": 10000}
    ).count()
    assert n_exists == built_index.count(F.col("tool").isNotNull())


# --------------------------------------------------------------------------
# bool composition
# --------------------------------------------------------------------------
def test_bool_reference_shape(built_index):
    # Running-ELK.md:234-247 — must matches + filter legs
    body = {"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "filter": [
            {"term": {"role": "user"}},
            {"range": {"turn_idx": {"gte": 1}}},
        ],
    }}, "size": 20}
    same(
        built_index.search(body, round_scores=6),
        built_index.topk(
            "the", k=20,
            filters=(F.col("role") == "user") & (F.col("turn_idx") >= 1),
            round_scores=6,
        ),
    )


def test_bool_must_not_and_should(built_index):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "must_not": [{"match": {"text": "tool"}}],
        "should": [{"match": {"text": "data"}}],
    }}, "size": 20}
    same(
        built_index.search(body, round_scores=6),
        built_index.topk(
            "the", k=20, must_not="tool", should="data", round_scores=6
        ),
    )


def test_bool_multiple_must_is_and_mode(built_index):
    # Running-ELK.md:234-239: two single-term match clauses in must
    body = {"query": {"bool": {"must": [
        {"match": {"text": "the"}}, {"match": {"text": "data"}},
    ]}}, "size": 20}
    same(
        built_index.search(body, round_scores=6),
        built_index.topk("the data", k=20, mode="and", round_scores=6),
    )


def test_bool_should_only(built_index):
    body = {"query": {"bool": {
        "should": [{"match": {"text": "the"}}, {"match": {"text": "data"}}],
        "minimum_should_match": 2,
    }}, "size": 20}
    same(
        built_index.search(body, round_scores=6),
        built_index.topk(
            "the data", k=20, min_should_match=2, round_scores=6
        ),
    )


def test_bool_pure_filter(built_index):
    body = {"query": {"bool": {
        "filter": [{"term": {"role": "assistant"}}],
        "must_not": [{"exists": {"field": "tool"}}],
    }}, "size": 100}
    want = (
        built_index.doc_stats()
        .filter((F.col("role") == "assistant")
                & ~F.coalesce(F.col("tool").isNotNull(), F.lit(False)))
        .select("doc_id").withColumn("score", F.lit(1.0))
        .orderBy("doc_id").limit(100)
    )
    same(built_index.search(body), want)


def test_bool_nested_filter_bool(built_index):
    body = {"query": {"bool": {"filter": [{"bool": {
        "should": [
            {"term": {"role": "user"}},
            {"term": {"role": "assistant"}},
        ]}}]}}, "size": 400}
    got_n = built_index.search(body).count()
    want_n = built_index.count(F.col("role").isin("user", "assistant"))
    assert got_n == min(400, want_n)


# --------------------------------------------------------------------------
# top-level decorations
# --------------------------------------------------------------------------
def test_from_offset_and_search_after(built_index):
    full = built_index.topk("the", k=15, round_scores=6).collect()
    got = built_index.search(
        {"query": {"match": {"text": "the"}}, "from": 5, "size": 10},
        round_scores=6,
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in full[5:]]
    cursor = (full[4]["score"], full[4]["doc_id"])
    got = built_index.search(
        {"query": {"match": {"text": "the"}}, "size": 10,
         "search_after": list(cursor)},
        round_scores=6,
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in full[5:]]


def test_min_score_and_source(built_index):
    hits = built_index.search(
        {"query": {"match": {"text": "the"}}, "min_score": 0.5, "size": 50},
        round_scores=6,
    )
    assert all(r["score"] >= 0.5 for r in hits.collect())
    got = built_index.search(
        {"query": {"match": {"text": "the"}}, "size": 5,
         "_source": ["role", "ts"]},
        round_scores=6,
    )
    assert got.columns == ["doc_id", "score", "role", "ts"]
    base = built_index.topk("the", k=5, round_scores=6).collect()
    assert [r["doc_id"] for r in got.collect()] == [
        r["doc_id"] for r in base
    ]


def test_sort_collapse(built_index):
    same(
        built_index.search(
            {"query": {"match": {"text": "the"}},
             "sort": [{"ts": {"order": "asc"}}], "size": 8}
        ),
        built_index.sort_by("the", by="ts", k=8, ascending=True),
    )
    # sort under a bool filter rides the threaded filters param
    same(
        built_index.search(
            {"query": {"bool": {
                "must": [{"match": {"text": "the"}}],
                "filter": [{"term": {"role": "user"}}]}},
             "sort": [{"ts": "desc"}], "size": 8}
        ),
        built_index.sort_by(
            "the", by="ts", k=8, ascending=False,
            filters=F.col("role") == "user",
        ),
    )
    same(
        built_index.search(
            {"query": {"match": {"text": "the"}},
             "collapse": {"field": "role"}, "size": 3},
            round_scores=6,
        ),
        built_index.collapse("the", by="role", k=3, round_scores=6),
    )


def test_rescore(pos_index):
    body = {
        "query": {"match": {"text": "alpha beta"}},
        "rescore": {
            "window_size": 30,
            "query": {
                "rescore_query": {"match_phrase": {"text": "alpha beta"}},
                "rescore_query_weight": 2.0,
            },
        },
        "size": 10,
    }
    same(
        pos_index.search(body, round_scores=6),
        pos_index.rescore(
            "alpha beta", "alpha beta", k=10, window_size=30, weight=2.0,
            round_scores=6,
        ),
    )


# --------------------------------------------------------------------------
# positional clauses on a positional mini-index
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    docs = [
        "alpha beta gamma delta", "beta alpha beta gamma",
        "gamma delta alpha", "alpha beta", "delta delta beta gamma alpha",
    ]
    df = spark.createDataFrame(
        [("c", i, t) for i, t in enumerate(docs)],
        "conv_id string, turn_idx int, text string",
    )
    out = str(tmp_path_factory.mktemp("dsl_pos") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=2, n_buckets=4, store_positions=True),
        meta_cols=("text",),
    )
    return InvertedIndex(spark, out)


def test_match_phrase_and_prefix(pos_index):
    # query context scores at ANY slop (anchored-window weighted anchors)
    same(
        pos_index.search(
            {"query": {"match_phrase": {"text": {
                "query": "alpha beta", "slop": 1}}}, "size": 10}
        ),
        pos_index.match_phrase_scored("alpha beta", k=10, slop=1),
    )
    # same doc set as the filter-context matcher (scores differ)
    assert sorted(
        r["doc_id"] for r in pos_index.search(
            {"query": {"match_phrase": {"text": {
                "query": "alpha beta", "slop": 1}}}, "size": 10}
        ).collect()
    ) == sorted(
        r["doc_id"]
        for r in pos_index.match_phrase("alpha beta", k=10, slop=1).collect()
    )
    same(
        pos_index.search(
            {"query": {"match_phrase_prefix": {"text": "beta ga"}},
             "size": 10}
        ),
        pos_index.match_phrase_prefix("beta ga", k=10),
    )
    # slop=0 in query context SCORES (Lucene PhraseQuery BM25), any field
    same(
        pos_index.search(
            {"query": {"match_phrase": {"text": "alpha beta"}}, "size": 10}
        ),
        pos_index.match_phrase_scored("alpha beta", k=10),
    )


def test_span_bodies(pos_index):
    t = lambda v: {"span_term": {"text": v}}
    same(
        pos_index.search(
            {"query": {"span_near": {
                "clauses": [t("alpha"), t("gamma")],
                "slop": 2, "in_order": True}}, "size": 10}
        ),
        pos_index.span_near(["alpha", "gamma"], slop=2, in_order=True, k=10),
    )
    same(
        pos_index.search(
            {"query": {"span_or": {"clauses": [t("delta"), t("beta")]}},
             "size": 10}
        ),
        pos_index.span_or(["delta", "beta"], k=10),
    )
    same(
        pos_index.search(
            {"query": {"span_first": {"match": t("beta"), "end": 2}},
             "size": 10}
        ),
        pos_index.span_first("beta", 2, k=10),
    )
    same(
        pos_index.search(
            {"query": {"span_not": {
                "include": t("beta"), "exclude": t("gamma"),
                "pre": 1, "post": 1}}, "size": 10}
        ),
        pos_index.span_not("beta", "gamma", pre=1, post=1, k=10),
    )
    same(
        pos_index.search(
            {"query": {"span_containing": {
                "big": {"span_near": {
                    "clauses": [t("alpha"), t("delta")], "slop": 3}},
                "little": t("beta")}}, "size": 10}
        ),
        pos_index.span_containing(
            ["alpha", "delta"], "beta", slop=3, in_order=True, k=10
        ),
    )


def test_highlight_body(pos_index):
    body = {
        "query": {"match": {"text": "alpha"}},
        "highlight": {"fields": {"text": {}},
                      "pre_tags": ["<b>"], "post_tags": ["</b>"]},
        "size": 5,
    }
    same(
        pos_index.search(body, round_scores=6),
        pos_index.highlight(
            "alpha", k=5, text_col="text", pre_tag="<b>", post_tag="</b>",
            round_scores=6,
        ),
    )


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------
def test_aggs_terms_and_stats(built_index):
    out = built_index.search_aggs({
        "query": {"match": {"text": "the"}},
        "aggs": {
            "roles": {"terms": {"field": "role", "size": 5}},
            "len": {"stats": {"field": "dl"}},
            "avg_len": {"avg": {"field": "dl"}},
        },
    })
    assert set(out) == {"roles", "len", "avg_len"}
    same(out["roles"], built_index.facet("the", by="role", k=5))
    same(out["len"], built_index.stats_agg("the", on="dl"))
    want_avg = built_index.stats_agg("the", on="dl").collect()[0]["avg"]
    assert out["avg_len"].collect()[0]["value"] == want_avg


def test_aggs_match_all_context(built_index, transcripts_pdf):
    out = built_index.search_aggs({
        "aggs": {"roles": {"terms": {"field": "role", "size": 10}}},
    })
    got = {r["role"]: r["doc_count"] for r in out["roles"].collect()}
    want = transcripts_pdf["role"].value_counts().to_dict()
    assert got == want


def test_aggs_filtered_context(built_index, transcripts_pdf):
    # bool {match + filter}: the filter context applies to aggs too
    out = built_index.search_aggs({
        "query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"term": {"role": "user"}}],
        }},
        "aggs": {"n": {"value_count": {"field": "dl"}}},
    })
    got = out["n"].collect()[0]["value"]
    # cross-check: matching docs that are role=user
    ids = {
        r["doc_id"]
        for r in built_index.topk("the", k=10**6, prune=False,
                                  filters=F.col("role") == "user").collect()
    }
    assert got == len(ids)


def test_aggs_date_histogram_and_pipeline(built_index):
    out = built_index.search_aggs({
        "query": {"match": {"text": "the"}},
        "aggs": {
            "per_day": {"date_histogram": {
                "field": "ts", "calendar_interval": "1d"}},
            "smooth": {
                "date_histogram": {"field": "ts", "calendar_interval": "1d"},
                "aggs": {"m": {"moving_fn": {"window": 4}}},
            },
        },
    })
    same(out["per_day"], built_index.date_histogram("the", on="ts",
                                                    interval="day"))
    same(out["smooth"],
         built_index.date_histogram_pipeline("the", on="ts", interval="day",
                                             window=4))
    # stats_bucket sibling = the whole min/max/avg/sum bundle in one agg
    out2 = built_index.search_aggs({
        "query": {"match": {"text": "the"}},
        "aggs": {"sb": {
            "date_histogram": {"field": "ts", "calendar_interval": "1d"},
            "aggs": {"s": {"stats_bucket": {
                "buckets_path": "sb>_count"}}},
        }},
    })
    same(out2["sb"],
         built_index.bucket_stats_pipeline("the", "ts", "day"))


def test_aggs_misc(built_index):
    out = built_index.search_aggs({
        "query": {"match": {"text": "the"}},
        "aggs": {
            "card": {"cardinality": {"field": "role"}},
            "pct": {"percentiles": {"field": "dl",
                                    "percents": [50.0, 90.0]}},
            "rng": {"range": {"field": "turn_idx",
                              "ranges": [{"to": 2}, {"from": 2}]}},
            "miss": {"missing": {"field": "tool"}},
            "hist": {"histogram": {"field": "turn_idx", "interval": 2}},
            "comp": {"composite": {
                "sources": [{"r": {"terms": {"field": "role"}}}],
                "size": 5}},
            "named": {"filters": {"filters": {
                "early": {"range": {"turn_idx": {"lt": 3}}},
                "users": {"term": {"role": "user"}}}}},
        },
    })
    same(out["card"], built_index.cardinality("the", on="role"))
    same(out["pct"],
         built_index.percentiles("the", on="dl", percents=[50.0, 90.0]))
    same(out["rng"],
         built_index.range_agg("the", on="turn_idx",
                               ranges=[(None, 2), (2, None)]))
    same(out["miss"], built_index.missing_agg("the", on="tool"))
    same(out["hist"], built_index.histogram("the", by="turn_idx",
                                            interval=2.0))
    same(out["comp"], built_index.composite_agg("the", sources=["role"],
                                                size=5))
    same(out["named"], built_index.filters_agg(
        "the",
        {"early": F.col("turn_idx") < 3, "users": F.col("role") == "user"},
        ["turn_idx", "role"],
    ))


def test_filters_threading_correctness(built_index, transcripts_pdf,
                                       spark):
    # the threaded filters param must behave exactly like pre-filtering
    # the corpus: recompute the facet under the filter in pandas
    from tests.oracle import BM25Oracle
    import numpy as np

    src = transcripts_pdf.sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    src["doc_id"] = np.arange(len(src), dtype=np.int64)
    orc = BM25Oracle(src)
    hits = {
        int(did) for did, toks in zip(orc.doc_ids, orc.tokens)
        if "the" in toks
    }
    sub = src[src["doc_id"].isin(hits) & (src["role"] == "user")]
    want = sub["turn_idx"].value_counts().sort_index()
    got = built_index.histogram(
        "the", by="turn_idx", interval=1.0,
        filters=F.col("role") == "user",
    ).collect()
    assert {r["bucket"]: r["doc_count"] for r in got} == {
        int(k): int(v) for k, v in want.items()
    }


def test_count_bodies(built_index):
    assert built_index.count_body({}) == built_index.count()
    assert built_index.count_body(
        {"query": {"term": {"role": "user"}}}
    ) == built_index.count(F.col("role") == "user")
    assert built_index.count_body(
        {"query": {"match": {"text": {"query": "the data",
                                      "operator": "and"}}}}
    ) == built_index.count_query("the data", mode="and")
    assert built_index.count_body(
        {"query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"term": {"role": "user"}}]}}}
    ) == built_index.count_query("the", filters=F.col("role") == "user")


def test_count_body_must_not(built_index):
    """_count accepts the same must_not text legs _search does: the count
    equals the number of hits the search path returns for that body."""
    body = {"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "filter": [{"term": {"role": "user"}}],
        "must_not": [{"match": {"text": "data"}}],
    }}}
    n = built_index.count_body(body)
    hits = built_index.search({**body, "size": 100000})
    assert n == hits.count()
    # pure-filter context with a text exclusion
    n2 = built_index.count_body({"query": {"bool": {
        "filter": [{"term": {"role": "user"}}],
        "must_not": [{"match": {"text": "the"}}],
    }}})
    base = built_index.count(F.col("role") == "user")
    with_the = built_index.count_query(
        "the", filters=F.col("role") == "user")
    assert n2 == base - with_the


# --------------------------------------------------------------------------
# vector forms: top-level knn + retriever rrf
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def emb_table(built_index):
    """Deterministic embeddings aligned to the index's doc_ids."""
    import numpy as np

    ids = [r.doc_id for r in
           built_index.doc_stats().select("doc_id").limit(300).collect()]
    rng = np.random.default_rng(7)
    rows_ = [(int(i), [float(x) for x in rng.standard_normal(8)])
             for i in sorted(ids)]
    return built_index.spark.createDataFrame(
        rows_, "vec_id long, embedding array<double>"
    )


QVEC = [0.5, -1.0, 0.25, 0.0, 1.5, -0.75, 0.3, 0.9]


def test_knn_body(built_index, emb_table):
    from dart_importer_spark.operators.similarity import (
        brute_force_cosine_topk,
    )

    got = built_index.search(
        {"knn": {"field": "embedding", "query_vector": QVEC, "k": 7,
                 "num_candidates": 50}},
        emb=emb_table,
    )
    want = brute_force_cosine_topk(emb_table, QVEC, k=7).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    same(got, want)


def test_knn_body_filter(built_index, emb_table):
    from dart_importer_spark.operators.similarity import (
        brute_force_cosine_topk,
    )

    got = built_index.search(
        {"knn": {"field": "embedding", "query_vector": QVEC, "k": 5,
                 "filter": {"term": {"role": "user"}}}},
        emb=emb_table,
    )
    allowed = built_index.doc_stats().filter(
        F.col("role") == "user"
    ).select(F.col("doc_id").alias("vec_id"))
    src = emb_table.join(allowed, "vec_id", "left_semi")
    want = brute_force_cosine_topk(src, QVEC, k=5).select(
        F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score")
    )
    same(got, want)
    # every hit passes the filter
    roles = {r.role for r in got.join(
        built_index.doc_stats().select("doc_id", "role"), "doc_id"
    ).collect()}
    assert roles <= {"user"}


def test_retriever_rrf_body(built_index, emb_table):
    got = built_index.search(
        {"retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"match": {"text": "the data"}}}},
                {"knn": {"field": "embedding", "query_vector": QVEC,
                         "k": 10, "num_candidates": 50}},
            ],
            "rank_window_size": 40, "rank_constant": 20,
        }}, "size": 12},
        emb=emb_table,
    )
    want = built_index.hybrid_rrf(
        "the data", QVEC, emb_table, k=12, window=40, rank_constant=20
    )
    same(got, want)


def test_vector_body_errors(built_index, emb_table):
    with pytest.raises(DslError, match="embedding table"):
        built_index.search(
            {"knn": {"field": "embedding", "query_vector": QVEC, "k": 3}})
    with pytest.raises(DslError, match="retriever"):
        built_index.search(
            {"knn": {"field": "embedding", "query_vector": QVEC, "k": 3},
             "query": {"match": {"text": "the"}}},
            emb=emb_table,
        )
    with pytest.raises(DslError, match="not the embedding column"):
        built_index.search(
            {"knn": {"field": "nope", "query_vector": QVEC, "k": 3}},
            emb=emb_table,
        )
    with pytest.raises(DslError, match="standard retriever"):
        built_index.search(
            {"retriever": {"rrf": {"retrievers": [
                {"standard": {"query": {"bool": {"must": []}}}},
                {"knn": {"query_vector": QVEC}},
            ]}}},
            emb=emb_table,
        )


# --------------------------------------------------------------------------
# deliberate-scope errors
# --------------------------------------------------------------------------
def test_dsl_errors(built_index):
    with pytest.raises(DslError, match="unsupported query clause"):
        built_index.search({"query": {"nope": {}}})
    with pytest.raises(DslError, match="filter context"):
        built_index.search({"query": {"bool": {
            "filter": [{"match": {"text": "the"}}]}}})
    with pytest.raises(DslError, match="not a stored metadata column"):
        built_index.search({"query": {"bool": {
            "filter": [{"term": {"nope_col": 1}}]}}})
    with pytest.raises(DslError, match="not an indexed field"):
        built_index.search({"query": {"bool": {"must": [
            {"match": {"text": "a"}}, {"match": {"nope": "b"}}]}}})
    with pytest.raises(DslError, match="only one of"):
        built_index.search({
            "query": {"match": {"text": "the"}},
            "sort": [{"ts": "asc"}], "collapse": {"field": "role"}})
    with pytest.raises(DslError, match="not supported"):
        # fuzzy can't take a bool filter leg
        built_index.search({"query": {"bool": {
            "must": [{"fuzzy": {"text": "thw"}}],
            "filter": [{"term": {"role": "user"}}]}}})
    with pytest.raises(DslError, match="aggs"):
        built_index.search_aggs({"query": {"match": {"text": "x"}}})
    with pytest.raises(DslError, match="one agg type"):
        built_index.search_aggs({"aggs": {"bad": {
            "terms": {"field": "role"}, "stats": {"field": "dl"}}}})


def test_intervals_body(pos_index):
    src = {"all_of": {"ordered": True, "max_gaps": 1, "intervals": [
        {"match": {"query": "alpha beta", "max_gaps": 0, "ordered": True}},
        {"match": {"query": "gamma"}},
    ]}}
    same(
        pos_index.search({"query": {"intervals": {"text": src}}, "size": 10}),
        pos_index.intervals_query(src, k=10),
    )
    with pytest.raises(DslError):
        pos_index.search({"query": {"intervals": {"a": {}, "b": {}}}})


def test_sampler_and_significant_text_aggs(built_index):
    got = built_index.search_aggs({
        "query": {"match": {"text": "the and"}},
        "aggs": {"sample": {
            "sampler": {"shard_size": 20},
            "aggs": {"roles": {"terms": {"field": "role", "size": 5}}},
        }},
    })["sample"]
    same(got, built_index.sampler_agg("the and", by="role",
                                      shard_size=20, k=5))
    got = built_index.search_aggs({
        "query": {"match": {"text": "the and"}},
        "aggs": {"sample": {
            "diversified_sampler": {
                "field": "conv_id", "shard_size": 15,
                "max_docs_per_value": 1},
            "aggs": {"roles": {"terms": {"field": "role", "size": 5}}},
        }},
    })["sample"]
    same(got, built_index.sampler_agg(
        "the and", by="role", shard_size=15, k=5,
        diversify_on="conv_id", max_docs_per_value=1,
    ))
    with pytest.raises(DslError):
        built_index.search_aggs({
            "query": {"match": {"text": "the"}},
            "aggs": {"s": {"sampler": {"shard_size": 5}}},  # no sub-agg
        })


def test_significant_text_agg_body(pos_index):
    got = pos_index.search_aggs({
        "query": {"match": {"text": "alpha"}},
        "aggs": {"kw": {"significant_text": {
            "field": "text", "size": 5, "min_doc_count": 1,
            "sample_size": 3,
        }}},
    })["kw"]
    same(got, pos_index.significant_text(
        "alpha", k=5, min_doc_count=1, sample_size=3,
        filter_duplicate_text=True,
    ))


def test_wrapper_and_match_none(built_index):
    import base64
    import json

    inner = {"match": {"text": "the and"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    same(
        built_index.search({"query": {"wrapper": {"query": b64}},
                            "size": 12}, round_scores=6),
        built_index.topk("the and", k=12, round_scores=6),
    )
    assert built_index.search({"query": {"match_none": {}}}).count() == 0
    with pytest.raises(DslError):
        built_index.search({"query": {"wrapper": {"query": "!!notb64json"}}})


def test_intervals_and_sig_text_resolve_nonprimary_field(spark, tmp_path_factory):
    """Review regression: on a multi-field index where 'text' is NOT
    fields[0], intervals/significant_text bodies naming 'text' must hit
    the text postings, not silently run against fields[0]."""
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c", 0, "zebra yak", "alpha beta gamma"),
        ("c", 1, "zebra emu", "alpha delta"),
        ("c", 2, "walrus emu", "beta gamma"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, title string, text string"
    )
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    build_index(
        spark, df, out,
        BuildConfig(n_segments=1, n_buckets=4, store_positions=True),
        text_cols=("title", "text"), meta_cols=("text",),
    )
    ix = InvertedIndex(spark, out)
    assert ix.fields[0] == "title"
    got = ix.search({"query": {"intervals": {"text": {
        "match": {"query": "beta gamma", "max_gaps": 0, "ordered": True}
    }}}, "size": 10})
    assert [r["doc_id"] for r in got.collect()] == [0, 2]
    # 'beta gamma' never appears in title — the old bug returned []
    sig = ix.search_aggs({
        "query": {"match": {"text": "beta"}},
        "aggs": {"kw": {"significant_text": {
            "field": "text", "size": 5, "min_doc_count": 1,
        }}},
    })["kw"]
    assert {r["term"] for r in sig.collect()} & {"beta", "gamma"}


# --- _validate/query and _field_caps ---------------------------------------
def test_validate_query(built_index):
    from dart_importer_spark.query.dsl import validate

    ok = validate(built_index, {"query": {"match": {"text": "the"}}})
    assert ok == {"valid": True, "explanation": None}
    # unknown clause type -> DslError surfaced, not raised
    bad = validate(built_index, {"query": {"nope": {}}})
    assert bad["valid"] is False and "nope" in bad["explanation"]
    # unknown metadata column in filter context
    badf = validate(built_index, {"query": {"term": {"no_such": 1}}})
    assert badf["valid"] is False
    # broken runtime-field script caught at compile
    rt = validate(built_index, {
        "runtime_mappings": {"x": {"script": {"source": "bogus_col + 1"}}},
        "query": {"match_all": {}},
    })
    assert rt["valid"] is False and "compile" in rt["explanation"]


def test_field_caps(built_index):
    caps = built_index.field_caps()["fields"]
    assert caps["text"] == {
        "type": "text", "searchable": True, "aggregatable": False,
    }
    assert caps["role"] == {
        "type": "keyword", "searchable": True, "aggregatable": True,
    }
    assert caps["turn_idx"]["type"] == "integer"
    assert caps["ts"]["type"] == "date"
    # engine-internal columns are not user fields
    for hidden in ("doc_id", "seg", "dl"):
        assert hidden not in caps
    # runtime fields appear like stored columns (ES behavior)
    view = built_index.with_runtime_fields({"tb": "turn_idx % 3"})
    assert view.field_caps()["fields"]["tb"] == {
        "type": "integer", "searchable": True, "aggregatable": True,
    }


def test_index_stats(built_index):
    s = built_index.index_stats()
    assert s["docs"]["count"] == built_index.count()
    assert s["docs"]["deleted"] >= 0
    assert s["store"]["size_in_bytes"] > 0
    assert set(s["store"]["by_table"]) >= {"doc_stats", "postings", "term_dict"}
    assert s["segments"]["count"] == 4
    assert s["fields"] == ["text"]


def test_validate_knn_body_with_emb(built_index, emb_table):
    from dart_importer_spark.query.dsl import validate

    body = {"knn": {"field": "embedding", "query_vector": QVEC, "k": 5,
                    "num_candidates": 50}}
    ok = validate(built_index, body, emb=emb_table)
    assert ok == {"valid": True, "explanation": None}
    # without the embedding table the same body is honestly un-runnable
    missing = validate(built_index, body)
    assert missing["valid"] is False


def test_validate_scored_filtered_uses_distributed_probe(built_index):
    # validate must not mutate the caller's index view and must report
    # a scored+filtered body valid via the budget-0 (distributed) path
    from dart_importer_spark.query.dsl import validate

    before = built_index.id_push_budget
    out = validate(built_index, {"query": {"bool": {
        "must": [{"match": {"text": "the"}}],
        "filter": [{"range": {"turn_idx": {"gte": 1}}}],
    }}})
    assert out["valid"] is True
    assert built_index.id_push_budget == before


def test_runtime_field_cannot_shadow_indexed_field(built_index):
    with pytest.raises(ValueError, match="indexed-field"):
        built_index.with_runtime_fields({"text": "upper(role)"})


def test_field_caps_long_type_via_runtime_field(built_index):
    view = built_index.with_runtime_fields(
        {"big": "cast(turn_idx as bigint)"}
    )
    assert view.field_caps()["fields"]["big"]["type"] == "long"


# --- _msearch over full request bodies -------------------------------------
def test_msearch_bodies_match_individual_search(built_index):
    from dart_importer_spark.query.dsl import msearch, search

    bodies = {
        "a": {"query": {"match": {"text": "the"}}, "size": 5},
        "b": {"query": {"match": {"text": {"query": "the and",
                                           "operator": "and"}}}, "size": 5},
        "c": {"query": {"bool": {
            "must": [{"match": {"text": "the"}}],
            "filter": [{"term": {"role": "user"}}],
        }}, "size": 5},
        "d": {"query": {"term": {"role": "tool"}}, "size": 3},
    }
    got = msearch(built_index, bodies, round_scores=6)
    assert set(got) == set(bodies)
    for qid, body in bodies.items():
        want = search(built_index, body, round_scores=6).toPandas()
        have = got[qid].toPandas()
        assert list(have["doc_id"]) == list(want["doc_id"]), qid
        assert list(have["score"]) == list(want["score"]), qid


def test_msearch_bodies_batches_kernel_once(built_index, monkeypatch):
    # the two same-shape match bodies must share ONE kernel invocation
    from dart_importer_spark.query import dsl

    calls = []
    orig = type(built_index).msearch

    def spy(self, queries, **kw):
        calls.append(dict(queries))
        return orig(self, queries, **kw)

    monkeypatch.setattr(type(built_index), "msearch", spy)
    dsl.msearch(built_index, {
        "x": {"query": {"match": {"text": "the"}}, "size": 5},
        "y": {"query": {"match": {"text": "and"}}, "size": 5},
        "z": {"query": {"term": {"role": "user"}}, "size": 5},
    })
    assert len(calls) == 1 and set(calls[0]) == {"x", "y"}


def test_multi_match_cross_fields_body(built_index):
    body = {"query": {"multi_match": {
        "query": "the and", "fields": ["text"],
        "type": "cross_fields", "operator": "and", "tie_breaker": 0.3,
    }}, "size": 5}
    same(
        built_index.search(body, round_scores=6),
        built_index.multi_match(
            "the and", ["text"], k=5, match_type="cross_fields",
            operator="and", tie_breaker=0.3, round_scores=6,
        ),
    )
    # operator on a field-centric type is refused, as in the engine API
    with pytest.raises(DslError, match="operator"):
        built_index.search({"query": {"multi_match": {
            "query": "x", "fields": ["text"],
            "type": "best_fields", "operator": "and",
        }}})


def test_knn_similarity_cutoff(built_index, emb_table):
    # ES 8.8: 'similarity' drops below-threshold neighbours AFTER the k
    # cut — fewer hits, never different ones
    full = built_index.search(
        {"knn": {"field": "embedding", "query_vector": QVEC, "k": 7}},
        emb=emb_table,
    ).collect()
    cut = sorted(r.score for r in full)[len(full) // 2]
    got = built_index.search(
        {"knn": {"field": "embedding", "query_vector": QVEC, "k": 7,
                 "similarity": cut}},
        emb=emb_table,
    ).collect()
    want = [r for r in full if r.score >= cut]
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
    assert 0 < len(got) < len(full)


def test_knn_body_ann_probe(built_index, emb_table):
    # ann= serves the knn section from a true ANN probe; full probe
    # (nprobe = n_lists) must equal the brute-force leg exactly
    from dart_importer_spark.operators import similarity

    ivf = similarity.IvfAnnIndex(emb_table, n_lists=6, seed=3, persist=False)
    body = {"knn": {"field": "embedding", "query_vector": QVEC, "k": 7,
                    "nprobe": 6}}
    got = built_index.search(dict(body), emb=emb_table, ann=ivf)
    want = built_index.search(dict(body), emb=emb_table)
    same(got, want)
    # filtered kNN through the ANN path: pre-filter before the rerank
    body["knn"]["filter"] = {"term": {"role": "user"}}
    got = built_index.search(dict(body), emb=emb_table, ann=ivf)
    want = built_index.search(dict(body), emb=emb_table)
    same(got, want)
    # narrow probe returns a subset of candidate lists — k hits, each a
    # real corpus vector with the exact cosine
    body["knn"].pop("filter")
    body["knn"]["nprobe"] = 1
    rows_narrow = built_index.search(
        dict(body), emb=emb_table, ann=ivf
    ).collect()
    full = {r.doc_id: r.score for r in want.collect()}
    exact = {
        r.doc_id: r.score
        for r in built_index.search(
            {"size": 100000,
             "knn": {"field": "embedding", "query_vector": QVEC,
                     "k": 100000}}, emb=emb_table).collect()
    }
    assert rows_narrow
    for r in rows_narrow:
        assert r.score == exact[r.doc_id]


def test_retriever_linear_body(built_index, emb_table):
    """ES 8.18 retriever: linear — wrapped legs with weights and explicit
    minmax normalizers compile to the engine's hybrid_linear; the bare
    'standard' retriever unwraps to a plain query; 'none' normalizer and
    unknown retriever kinds raise."""
    got = built_index.search(
        {"retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {
                    "query": {"match": {"text": "the data"}}}},
                 "weight": 0.7, "normalizer": "minmax"},
                {"retriever": {"knn": {"query_vector": QVEC}},
                 "weight": 0.3, "normalizer": "minmax"},
            ],
            "rank_window_size": 40,
        }}, "size": 12},
        emb=emb_table,
    )
    want = built_index.hybrid_linear(
        "the data", QVEC, emb_table, k=12, window=40,
        lex_weight=0.7, vec_weight=0.3,
    )
    same(got, want)
    # standard-only retriever == the plain query body (no emb needed)
    got2 = built_index.search(
        {"retriever": {"standard": {
            "query": {"match": {"text": "the data"}}}}, "size": 7})
    want2 = built_index.search(
        {"query": {"match": {"text": "the data"}}, "size": 7})
    same(got2, want2)
    with pytest.raises(DslError, match="normalizer"):
        built_index.search(
            {"retriever": {"linear": {"retrievers": [
                {"retriever": {"standard": {
                    "query": {"match": {"text": "the"}}}}, "weight": 1.0},
                {"retriever": {"knn": {"query_vector": QVEC}},
                 "normalizer": "minmax"},
            ]}}},
            emb=emb_table,
        )
    with pytest.raises(DslError, match="only 'standard', 'rrf' and 'linear'"):
        built_index.search({"retriever": {"dbsf": {}}}, emb=emb_table)
    # ES rejects retriever + top-level query (400) — so do we, instead of
    # silently overwriting one with the other
    with pytest.raises(DslError, match="cannot be used together"):
        built_index.search({
            "query": {"term": {"role": "user"}},
            "retriever": {"standard": {
                "query": {"match": {"text": "the data"}}}},
        })
    # unsupported standard-retriever fields raise instead of being dropped
    with pytest.raises(DslError, match="unsupported fields"):
        built_index.search({"retriever": {"standard": {
            "query": {"match": {"text": "the"}}, "min_score": 5}}})
