"""ES aggregation family over the match set: date_histogram, cardinality
(exact + HLL approx), percentiles (exact + t-digest approx), terms+stats
sub-agg, and top_hits — checked against pandas recomputation."""

from __future__ import annotations

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


def test_date_histogram_day(built_index, src, oracle):
    got = built_index.date_histogram("the and", on="ts", interval="day").toPandas()
    hits = _match_set(oracle, ["the", "and"])
    sub = src[src["doc_id"].isin(hits)]
    want = (
        sub["ts"].dt.floor("D").dt.strftime("%Y-%m-%d %H:%M:%S")
        .value_counts().sort_index()
    )
    assert list(got["bucket"]) == list(want.index)
    assert list(got["doc_count"]) == list(want.values)


def test_cardinality_exact_and_approx(built_index, src, oracle):
    hits = _match_set(oracle, ["the"])
    want = src[src["doc_id"].isin(hits)]["role"].nunique()
    got = built_index.cardinality("the", on="role").collect()[0]["value"]
    assert got == want
    approx = built_index.cardinality("the", on="role", exact=False).collect()[0][
        "value"
    ]
    assert abs(approx - want) <= max(1, 0.15 * want)


def test_percentiles_exact_matches_numpy(built_index, src, oracle):
    hits = _match_set(oracle, ["the"])
    vals = src[src["doc_id"].isin(hits)]["turn_idx"].to_numpy(dtype=float)
    got = built_index.percentiles(
        "the", on="turn_idx", percents=(25.0, 50.0, 90.0)
    ).toPandas()
    want = np.percentile(vals, [25, 50, 90], method="linear")
    assert list(got["percent"]) == [25.0, 50.0, 90.0]
    assert np.allclose(got["value"], want, atol=1e-9)
    # t-digest-style approx lands within a loose band of the exact value
    ap = built_index.percentiles(
        "the", on="turn_idx", percents=(50.0,), exact=False
    ).collect()[0]["value"]
    lo, hi = np.percentile(vals, [30, 70])
    assert lo <= ap <= hi


def test_facet_stats_subagg(built_index, src, oracle):
    got = built_index.facet_stats("the", by="role", on="turn_idx").toPandas()
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    g = sub.groupby("role")["turn_idx"]
    for _, row in got.iterrows():
        r = row["role"]
        assert row["doc_count"] == int(g.count()[r])
        assert row["min"] == int(g.min()[r])
        assert row["max"] == int(g.max()[r])
        assert row["sum"] == int(g.sum()[r])
        assert row["avg"] == pytest.approx(round(float(g.mean()[r]), 6))
    # ordered by doc_count desc, bucket asc
    counts = list(got["doc_count"])
    assert counts == sorted(counts, reverse=True)


def test_top_hits_per_bucket(built_index, src, oracle):
    got = built_index.top_hits(
        "the and", by="role", size=2, round_scores=6
    ).toPandas()
    s = oracle.scores("the and")
    s = s.merge(src[["doc_id", "role"]], on="doc_id")
    s["score"] = s["score"].round(6)
    for role, grp in s.groupby("role"):
        top = grp.sort_values(["score", "doc_id"], ascending=[False, True]).head(2)
        mine = got[got["role"] == role].sort_values("rank")
        assert list(mine["doc_id"]) == list(top["doc_id"])
        assert np.allclose(mine["score"], top["score"], atol=1e-9)
        assert list(mine["rank"]) == list(range(1, len(mine) + 1))


def test_significant_terms_jlh(built_index, src, oracle):
    got = built_index.significant_terms(
        "w00042", k=10, min_doc_count=2
    ).toPandas()
    hits = _match_set(oracle, ["w00042"])
    fg_n = float(len(hits))
    bg_n = float(len(src))
    from collections import Counter

    fgc: Counter = Counter()
    for did, toks in zip(oracle.doc_ids, oracle.tokens):
        if int(did) in hits:
            fgc.update(set(toks))
    rows = []
    for t, c in fgc.items():
        if c < 2:
            continue
        fgp, bgp = c / fg_n, oracle.df[t] / bg_n
        rows.append((t, round((fgp - bgp) * (fgp / bgp), 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert list(got["term"]) == [t for t, _ in rows[:10]]
    assert np.allclose(got["score"], [s for _, s in rows[:10]], atol=1e-9)
    # the query term itself is maximally significant -> rank 1
    assert got["term"].iloc[0] == "w00042"


def test_significant_terms_budget_fallback(built_index):
    want = built_index.significant_terms("w00042", k=5).toPandas()
    saved = built_index.id_push_budget
    try:
        built_index.id_push_budget = 1  # force the distributed semi-join path
        got = built_index.significant_terms("w00042", k=5).toPandas()
    finally:
        built_index.id_push_budget = saved
    assert list(got["term"]) == list(want["term"])
    assert np.allclose(got["score"], want["score"], atol=1e-9)


def test_function_score_field_value_factor(built_index, src, oracle):
    got = built_index.function_score(
        "the and", k=15, factor_col="turn_idx", modifier="log1p",
        boost_mode="multiply",
    ).toPandas()
    s = oracle.scores("the and").merge(
        src[["doc_id", "turn_idx"]], on="doc_id"
    )
    s["final"] = s["score"] * np.log1p(s["turn_idx"].astype(float))
    top = s.sort_values(["final", "doc_id"], ascending=[False, True]).head(15)
    assert list(got["doc_id"]) == list(top["doc_id"])
    assert np.allclose(got["score"], top["final"], atol=1e-9)
    # sum mode with modifier none
    got2 = built_index.function_score(
        "the", k=5, factor_col="turn_idx", modifier="none", boost_mode="sum"
    ).toPandas()
    s2 = oracle.scores("the").merge(src[["doc_id", "turn_idx"]], on="doc_id")
    s2["final"] = s2["score"] + s2["turn_idx"].astype(float)
    top2 = s2.sort_values(["final", "doc_id"], ascending=[False, True]).head(5)
    assert list(got2["doc_id"]) == list(top2["doc_id"])
    with pytest.raises(ValueError):
        built_index.function_score("the", modifier="square")
    with pytest.raises(ValueError):
        built_index.function_score("the", boost_mode="max")


def test_collapse_one_hit_per_value(built_index, src, oracle):
    got = built_index.collapse("the and", by="role", k=10).toPandas()
    s = oracle.scores("the and").merge(src[["doc_id", "role"]], on="doc_id")
    best = (
        s.sort_values(["score", "doc_id"], ascending=[False, True])
        .groupby("role", as_index=False)
        .first()
        .sort_values(["score", "doc_id"], ascending=[False, True])
    )
    assert list(got["doc_id"]) == list(best["doc_id"])
    assert got["role"].is_unique
    assert np.allclose(got["score"], best["score"], atol=1e-9)


def test_highlight_tags_all_occurrences(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "Alpha beta ALPHA gamma alphabet"),
        ("c1", 1, "beta beta"),
        ("c2", 0, "no match here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("hl") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("text",),
    )
    ix = InvertedIndex(spark, out)
    got = {
        r["doc_id"]: r["highlighted"]
        for r in ix.highlight("alpha", k=10).collect()
    }
    # case-insensitive, word-boundary (alphabet untouched), all occurrences
    assert got == {
        0: "<em>Alpha</em> beta <em>ALPHA</em> gamma alphabet"
    }
    multi = {
        r["doc_id"]: r["highlighted"]
        for r in ix.highlight("alpha beta", k=10).collect()
    }
    assert multi[1] == "<em>beta</em> <em>beta</em>"
    assert ix.highlight("zzz", k=5).count() == 0


def test_highlight_cjk_terms(spark, tmp_path_factory):
    """CJK terms can't use ASCII \\b boundaries — they match bare
    occurrences (the documented deterministic rule)."""
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [("c1", 0, "삼성 전자 보고서"), ("c1", 1, "plain text only")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("hlcjk") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
        meta_cols=("text",),
    )
    ix = InvertedIndex(spark, out)
    got = {r["doc_id"]: r["highlighted"] for r in ix.highlight("삼성", k=5).collect()}
    assert got == {0: "<em>삼성</em> 전자 보고서"}


def test_meta_columns_survive_delete_and_compaction(spark, tmp_path_factory):
    """Stored meta columns (ts for date_histogram, text for highlight)
    must survive delete_by_query + compact_index — compaction rewrites
    doc_stats and must carry the full schema through."""
    import datetime

    from pyspark.sql import functions as F

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.index.merge import compact_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "alpha beta", datetime.datetime(2024, 1, 1)),
        ("c1", 1, "beta gamma", datetime.datetime(2024, 1, 2)),
        ("c2", 0, "alpha delta", datetime.datetime(2024, 1, 3)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    base = tmp_path_factory.mktemp("metacompact")
    idx, out = str(base / "idx"), str(base / "compacted")
    build_index(
        spark, df, idx, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("text", "ts"),
    )
    ix = InvertedIndex(spark, idx)
    assert ix.delete_by_query(F.col("conv_id") == "c1") == 2
    compact_index(spark, idx, out)
    cx = InvertedIndex(spark, out)
    hl = cx.highlight("alpha", k=5).collect()
    assert [r["doc_id"] for r in hl] == [2]
    assert hl[0]["highlighted"] == "<em>alpha</em> delta"
    dh = cx.date_histogram("alpha delta", on="ts", interval="day").collect()
    assert [(r["bucket"], r["doc_count"]) for r in dh] == [
        ("2024-01-03 00:00:00", 1)
    ]


def test_highlight_requires_stored_text(built_index):
    with pytest.raises(ValueError, match="does not store"):
        built_index.highlight("the", text_col="text")


def test_aggs_empty_query(built_index):
    assert built_index.date_histogram("zzqx", on="ts").count() == 0
    assert built_index.cardinality("zzqx", on="role").collect()[0]["value"] == 0
    assert built_index.top_hits("zzqx", by="role").count() == 0


def test_composite_agg_keyset_pagination(built_index, src, oracle):
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    want = (
        sub.groupby(["role", "tool"], dropna=False).size().reset_index(name="n")
        .sort_values(["role", "tool"], na_position="first")
    )
    # page through with size=2 and reassemble
    pages, after = [], None
    while True:
        page = built_index.composite_agg(
            "the", sources=["role", "tool"], size=2, after=after
        ).collect()
        if not page:
            break
        pages.extend(page)
        if page[-1]["tool"] is None:  # NULL after-keys are refused (3VL)
            break
        after = (page[-1]["role"], page[-1]["tool"])
        if len(page) < 2:
            break
    got = [(r["role"], r["tool"], r["doc_count"]) for r in pages]
    assert len(got) == len(set(got)) > 0  # no duplicate buckets across pages
    # NULL-keyed buckets can't be resumed past with a NULL after-key:
    # compare against the non-null keyspace
    nn = want[want["tool"].notna()]
    got_nn = [g for g in got if g[1] is not None]
    assert got_nn == list(map(tuple, nn[["role", "tool", "n"]].itertuples(index=False)))
    with pytest.raises(ValueError):
        built_index.composite_agg("the", sources=["role"], after=("a", "b"))


def test_highlight_tags_with_regex_metachars(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [("c1", 0, "alpha beta")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("hlmeta") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=1, n_buckets=2),
                meta_cols=("text",))
    ix = InvertedIndex(spark, out)
    r = ix.highlight(
        "alpha", k=1, pre_tag='<em data-x="$q\\y">', post_tag="</em>"
    ).collect()[0]
    assert r["highlighted"] == '<em data-x="$q\\y">alpha</em> beta'


def test_highlight_fragments(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    filler = " ".join(f"w{i:03d}" for i in range(30))  # ~180 chars of noise
    rows = [
        # two alpha clusters far apart -> two fragments; the adjacent
        # second 'alpha' in the first cluster is absorbed into fragment 1
        ("c1", 0, f"alpha one alpha {filler} alpha two"),
        ("c1", 1, "alpha at start only"),
        ("c2", 0, "no match here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("hlf") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("text",),
    )
    ix = InvertedIndex(spark, out)
    got = ix.highlight(
        "alpha", k=10, number_of_fragments=3, fragment_size=60
    ).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    # doc 0: clusters ~pos 1 and ~pos 200 -> exactly 2 fragments
    assert len(by_doc[0]) == 2
    # doc 1: single match -> one fragment; non-matching doc absent
    assert len(by_doc[1]) == 1 and 2 not in by_doc
    for r in got:
        assert len(r["fragment"]) <= 60
        assert "<em>alpha</em>" in r["fragment"]
    # fragment indexes are 1-based and ordered
    assert [r["frag_idx"] for r in by_doc[0]] == [1, 2]


def test_histogram_fractional_interval(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "alpha", 0.2), ("c1", 1, "alpha", 0.4),
        ("c2", 0, "alpha", 0.6), ("c2", 1, "alpha", 1.1),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ratio double"
    )
    out = str(tmp_path_factory.mktemp("histf") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
        meta_cols=("ratio",),
    )
    ix = InvertedIndex(spark, out)
    got = {
        float(r["bucket"]): int(r["doc_count"])
        for r in ix.histogram("alpha", by="ratio", interval=0.5).collect()
    }
    # 0.2/0.4 -> bucket 0.0; 0.6 -> 0.5; 1.1 -> 1.0 (a long cast would
    # have merged 0.0 and 0.5)
    assert got == {0.0: 2, 0.5: 1, 1.0: 1}
    # integral intervals keep long keys
    ints = ix.histogram("alpha", by="ratio", interval=1).collect()
    assert all(isinstance(r["bucket"], int) for r in ints)
    import pytest as _pt
    with _pt.raises(ValueError):
        ix.histogram("alpha", by="ratio", interval=0)


def test_extended_stats_matches_numpy(spark, tmp_path_factory):
    import numpy as np

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    vals = [3.0, 7.0, 1.0, 9.0, 5.0]
    rows = [("c1", i, "alpha", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, x double"
    )
    out = str(tmp_path_factory.mktemp("xs") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("x",))
    ix = InvertedIndex(spark, out)
    r = ix.extended_stats_agg("alpha", on="x").collect()[0]
    a = np.array(vals)
    assert r["count"] == 5 and r["min"] == 1.0 and r["max"] == 9.0
    assert abs(r["sum_of_squares"] - float((a * a).sum())) < 1e-9
    assert abs(r["variance"] - float(a.var())) < 1e-9  # population, like ES
    assert abs(r["std_deviation"] - float(a.std())) < 1e-9
    assert abs(r["std_upper"] - (a.mean() + 2 * a.std())) < 1e-9


def test_range_filters_missing_aggs(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "alpha", 10, "en"),
        ("c1", 1, "alpha", 25, "de"),
        ("c2", 0, "alpha", 40, "en"),
        ("c2", 1, "alpha", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, n int, lang string"
    )
    out = str(tmp_path_factory.mktemp("ra") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("n", "lang"))
    ix = InvertedIndex(spark, out)
    # range: from inclusive, to exclusive, unbounded via None, overlapping ok
    got = {
        r["key"]: r["doc_count"]
        for r in ix.range_agg("alpha", on="n",
                              ranges=[(None, 20), (20, 40), (20, None)]).collect()
    }
    assert got == {"*-20": 1, "20-40": 1, "20-*": 2}
    from pyspark.sql import functions as F

    got = {
        r["key"]: r["doc_count"]
        for r in ix.filters_agg(
            "alpha",
            {"english": F.col("lang") == "en", "big": F.col("n") >= 25},
            cols=["lang", "n"],
        ).collect()
    }
    assert got == {"english": 2, "big": 2}
    assert ix.missing_agg("alpha", on="lang").collect()[0]["doc_count"] == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        ix.range_agg("alpha", on="n", ranges=[])
    with _pt.raises(ValueError):
        ix.filters_agg("alpha", {}, cols=[])


def test_percentile_ranks_midpoint_ties(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    vals = [10.0, 20.0, 20.0, 30.0, 40.0]
    rows = [("c1", i, "alpha", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, x double"
    )
    out = str(tmp_path_factory.mktemp("pr") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("x",))
    ix = InvertedIndex(spark, out)
    got = {
        r["value"]: r["rank"]
        for r in ix.percentile_ranks("alpha", on="x",
                                     values=[5.0, 20.0, 40.0, 99.0]).collect()
    }
    # midpoint convention: rank = 100*(count(x<v) + 0.5*count(x==v))/n
    assert got[5.0] == 0.0
    assert abs(got[20.0] - 100.0 * (1 + 0.5 * 2) / 5) < 1e-9
    assert abs(got[40.0] - 100.0 * (4 + 0.5) / 5) < 1e-9
    assert got[99.0] == 100.0
    import pytest as _pt
    with _pt.raises(ValueError):
        ix.percentile_ranks("alpha", on="x", values=[])


def test_string_stats_entropy(spark, tmp_path_factory):
    import math

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "alpha", "aab"),
        ("c1", 1, "alpha", "b"),
        ("c2", 0, "alpha", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, s string"
    )
    out = str(tmp_path_factory.mktemp("ss") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("s",))
    ix = InvertedIndex(spark, out)
    r = ix.string_stats("alpha", on="s").collect()[0]
    assert r["count"] == 2  # null value excluded, like ES
    assert r["min_length"] == 1 and r["max_length"] == 3
    assert abs(r["avg_length"] - 2.0) < 1e-9
    # chars: a:2, b:2 over 4 -> entropy = 1 bit
    assert abs(r["entropy"] - 1.0) < 1e-9
    # skewed distribution: -0.75*log2(0.75) - 0.25*log2(0.25)
    rows2 = [("c1", 0, "alpha", "aaab")]
    df2 = spark.createDataFrame(
        rows2, "conv_id string, turn_idx int, text string, s string"
    )
    out2 = str(tmp_path_factory.mktemp("ss2") / "idx")
    build_index(spark, df2, out2, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("s",))
    r2 = InvertedIndex(spark, out2).string_stats("alpha", on="s").collect()[0]
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(r2["entropy"] - round(want, 6)) < 1e-9


def test_t_test_welch_matches_formula(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex
    from pyspark.sql import functions as F

    a = [12.0, 15.0, 11.0, 18.0]
    b = [22.0, 25.0, 19.0]
    rows = [("c1", i, "alpha", v, "x") for i, v in enumerate(a)] + [
        ("c2", i, "alpha", v, "y") for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, v double, grp string"
    )
    out = str(tmp_path_factory.mktemp("tt") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("v", "grp"))
    ix = InvertedIndex(spark, out)
    r = ix.t_test(
        "alpha", on="v", by="grp", group_a="x", group_b="y"
    ).collect()[0]
    import numpy as np

    A, B = np.array(a), np.array(b)
    se = A.var(ddof=1) / len(A) + B.var(ddof=1) / len(B)
    t = (A.mean() - B.mean()) / se ** 0.5
    dof = se ** 2 / (
        (A.var(ddof=1) / len(A)) ** 2 / (len(A) - 1)
        + (B.var(ddof=1) / len(B)) ** 2 / (len(B) - 1)
    )
    assert abs(r["t_stat"] - round(float(t), 6)) < 1e-9
    assert abs(r["deg_f"] - round(float(dof), 6)) < 1e-9
    assert r["n_a"] == 4 and r["n_b"] == 3


def test_multi_terms_and_global(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        ("c1", 0, "alpha", "en", "web", 10),
        ("c1", 1, "alpha", "en", "web", 20),
        ("c2", 0, "alpha", "en", "book", 30),
        ("c2", 1, "alpha", None, "book", 40),
        ("c3", 0, "beta only", "de", "web", 50),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, text string, lang string, src string, n int",
    )
    out = str(tmp_path_factory.mktemp("mt") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("lang", "src", "n"))
    ix = InvertedIndex(spark, out)
    got = [
        (r["lang"], r["src"], r["doc_count"])
        for r in ix.multi_terms("alpha", by=["lang", "src"], k=10).collect()
    ]
    # null-keyed doc dropped; (en, web)=2 first, then (en, book)=1
    assert got == [("en", "web", 2), ("en", "book", 1)]
    g = ix.global_agg("alpha", on="n").collect()[0]
    assert g["query_count"] == 4 and g["global_count"] == 5
    assert abs(g["query_avg"] - 25.0) < 1e-9 and abs(g["global_avg"] - 30.0) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        ix.multi_terms("alpha", by=[], k=10)


def test_sampler_agg_counts_top_sample(built_index, src, oracle):
    got = built_index.sampler_agg("the and", by="role", shard_size=20).toPandas()
    top = oracle.topk("the and", k=20)
    sub = src[src["doc_id"].isin(set(top["doc_id"]))]
    want = (
        sub.groupby("role").size().reset_index(name="n")
        .sort_values(["n", "role"], ascending=[False, True])
    )
    assert list(got["role"]) == list(want["role"])
    assert list(got["doc_count"]) == list(want["n"])


def test_diversified_sampler_caps_per_value(built_index, src, oracle):
    got = built_index.sampler_agg(
        "the and", by="role", shard_size=15,
        diversify_on="conv_id", max_docs_per_value=1,
    ).toPandas()
    s = oracle.scores("the and").merge(
        src[["doc_id", "conv_id", "role"]], on="doc_id"
    ).sort_values(["score", "doc_id"], ascending=[False, True])
    div = s.groupby("conv_id", sort=False).head(1).head(15)
    want = (
        div.groupby("role").size().reset_index(name="n")
        .sort_values(["n", "role"], ascending=[False, True])
    )
    assert list(got["role"]) == list(want["role"])
    assert list(got["doc_count"]) == list(want["n"])
    # the sample really is diversified: one doc per conv_id
    assert div["conv_id"].is_unique


def test_significant_text_dedups_foreground(spark, tmp_path_factory):
    from datetime import datetime

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    boiler = "alert system notice qqmarker qqmarker qqmarker"
    rows = [(f"c{i}", 0, boiler, datetime(2024, 3, 1), 10) for i in range(5)]
    rows += [
        ("d1", 0, "alert threshold breached on disk", datetime(2024, 3, 2), 20),
        ("d2", 0, "alert for memory and swap", datetime(2024, 3, 3), 30),
        ("d3", 0, "unrelated filler text entirely", datetime(2024, 3, 4), 40),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp, nc long"
    )
    out = str(tmp_path_factory.mktemp("sigtext") / "idx")
    build_index(
        spark, df, out, BuildConfig(n_segments=1, n_buckets=4),
        meta_cols=("ts", "text"),
    )
    ix = InvertedIndex(spark, out)
    # duplicates kept: the copy-paste marker dominates the foreground
    raw = {r["term"] for r in ix.significant_text(
        "alert", k=5, min_doc_count=3, filter_duplicate_text=False
    ).collect()}
    assert "qqmarker" in raw
    # duplicates filtered: one representative left -> marker drops below
    # min_doc_count, while genuinely recurring terms survive
    dedup = {r["term"] for r in ix.significant_text(
        "alert", k=5, min_doc_count=3, filter_duplicate_text=True
    ).collect()}
    assert "qqmarker" not in dedup
    # sample_size restricts the foreground to top-scored hits and still runs
    top = ix.significant_text(
        "alert", k=5, min_doc_count=1, sample_size=2,
        filter_duplicate_text=True,
    )
    assert top.count() >= 1
    # without text meta the dup filter refuses instead of silently skipping
    with pytest.raises(ValueError):
        InvertedIndex(spark, out)  # reopen is fine...
        bad_out = str(tmp_path_factory.mktemp("sigtext2") / "idx")
        build_index(
            spark, df, bad_out, BuildConfig(n_segments=1, n_buckets=4),
            meta_cols=("ts",),
        )
        InvertedIndex(spark, bad_out).significant_text("alert").collect()


def test_rank_eval_metrics(built_index, oracle):
    top1 = oracle.topk("the and", k=5)["doc_id"].tolist()
    top2 = oracle.topk("the", k=5)["doc_id"].tolist()
    # rate: first and third of q1 relevant (2/1), second of q2 relevant
    reqs = [
        {"id": "q1", "query": "the and",
         "ratings": {top1[0]: 2, top1[2]: 1, 999999: 3}},
        {"id": "q2", "query": "the", "ratings": {top2[1]: 1}},
        {"id": "q3", "query": "zzznotaterm", "ratings": {1: 1}},
    ]
    got = {r["req_id"]: r["score"] for r in built_index.rank_eval(
        reqs, {"precision": {"k": 5, "relevant_rating_threshold": 1}}
    ).collect()}
    assert got["q1"] == 0.4 and got["q2"] == 0.2 and got["q3"] == 0.0
    assert abs(got["_mean"] - (0.4 + 0.2) / 3) < 1e-9

    got = {r["req_id"]: r["score"] for r in built_index.rank_eval(
        reqs, {"mean_reciprocal_rank": {"k": 5}}
    ).collect()}
    assert got["q1"] == 1.0 and got["q2"] == 0.5 and got["q3"] == 0.0

    import numpy as np
    got = {r["req_id"]: r["score"] for r in built_index.rank_eval(
        reqs, {"dcg": {"k": 5, "normalize": True}}
    ).collect()}
    # q1: gains (2^2-1) at rank1 + (2^1-1) at rank3; ideal: ratings
    # 3,2,1 at ranks 1,2,3 (the unretrieved doc 999999 still shapes IDCG)
    dcg = 3 / np.log2(2) + 1 / np.log2(4)
    idcg = 7 / np.log2(2) + 3 / np.log2(3) + 1 / np.log2(4)
    assert abs(got["q1"] - round(dcg / idcg, 6)) < 1e-9
    assert got["q3"] == 0.0


def test_brute_force_topk_batch_matches_per_query(spark):
    import numpy as np

    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(13)
    V = rng.standard_normal((80, 12))
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + j, V[j * 7].tolist()) for j in range(5)],
        "q_id long, q_vec array<double>",
    )
    got = similarity.brute_force_cosine_topk_batch(
        emb, queries, k=4, n_blocks=6
    ).toPandas()
    for j in range(5):
        want = similarity.brute_force_cosine_topk(
            emb, V[j * 7].tolist(), k=4
        ).toPandas()
        sub = got[got["q_id"] == 100 + j].sort_values("rank")
        assert list(sub["vec_id"]) == list(want["vec_id"])
        assert np.allclose(sub["cosine"], want["cosine"], atol=1e-9)


def test_ivf_topk_batch_matches_per_query(spark):
    import numpy as np

    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(29)
    V = rng.standard_normal((120, 16))
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    ivf = similarity.IvfAnnIndex(emb, n_lists=8, seed=7, persist=False)
    queries = spark.createDataFrame(
        [(200 + j, V[j * 11].tolist()) for j in range(4)],
        "q_id long, q_vec array<double>",
    )
    got = ivf.topk_batch(queries, k=5, nprobe=3).toPandas()
    for j in range(4):
        want = ivf.topk(V[j * 11].tolist(), k=5, nprobe=3).toPandas()
        sub = got[got["q_id"] == 200 + j].sort_values("rank")
        assert list(sub["vec_id"]) == list(want["vec_id"])
        assert np.allclose(sub["cosine"], want["cosine"], atol=1e-9)


def test_ivf_topk_batch_distributed_centroid_path(spark):
    """Force the big-quantizer branch (centroids not held on the driver):
    results must match the in-memory branch exactly."""
    import numpy as np

    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(31)
    V = rng.standard_normal((60, 8))
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    ivf = similarity.IvfAnnIndex(emb, n_lists=6, seed=3, persist=False)
    queries = spark.createDataFrame(
        [(0, V[5].tolist()), (1, V[30].tolist())],
        "q_id long, q_vec array<double>",
    )
    mem = ivf.topk_batch(queries, k=4, nprobe=2).toPandas()

    ivf._centroid_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(ivf.centroids)],
        "list_id int, centroid array<double>",
    )
    ivf.centroids = None  # what load() does past DRIVER_RANK_MAX
    dist = ivf.topk_batch(queries, k=4, nprobe=2).toPandas()
    key = ["q_id", "rank"]
    assert list(mem.sort_values(key)["vec_id"]) == list(
        dist.sort_values(key)["vec_id"]
    )


def test_ivf_topk_batch_clamps_nprobe(spark):
    import numpy as np

    from dart_importer_spark.operators import similarity

    rng = np.random.default_rng(41)
    V = rng.standard_normal((30, 8))
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    ivf = similarity.IvfAnnIndex(emb, n_lists=4, seed=5, persist=False)
    q = spark.createDataFrame(
        [(0, V[3].tolist())], "q_id long, q_vec array<double>"
    )
    # nprobe beyond n_lists: full probe, no reshape crash, exact result
    got = ivf.topk_batch(q, k=3, nprobe=99).toPandas()
    want = similarity.brute_force_cosine_topk(emb, V[3].tolist(), k=3).toPandas()
    assert list(got.sort_values("rank")["vec_id"]) == list(want["vec_id"])


# --- scripted_metric: ES init/map/combine/reduce as Python callables ------
def _sm_fns():
    def init():
        return {"n": 0, "user_turns": 0, "asst_docs": 0}

    def map_batch(state, pdf):
        role = pdf["role"].to_numpy()
        state["n"] += len(pdf)
        state["user_turns"] += int(
            pdf["turn_idx"].to_numpy()[role == "user"].sum()
        )
        state["asst_docs"] += int((role == "assistant").sum())
        return state

    def combine(state):
        return state

    def reduce(partials):
        return {
            k: sum(p[k] for p in partials) for k in ("n", "user_turns", "asst_docs")
        }

    return init, map_batch, combine, reduce


def test_scripted_metric_matches_pandas(built_index, src, oracle):
    init, map_batch, combine, reduce = _sm_fns()
    got = built_index.scripted_metric(
        "the", cols=["role", "turn_idx"],
        init_fn=init, map_fn=map_batch, combine_fn=combine, reduce_fn=reduce,
    )
    hits = _match_set(oracle, ["the"])
    sub = src[src["doc_id"].isin(hits)]
    assert got == {
        "n": len(sub),
        "user_turns": int(sub.loc[sub["role"] == "user", "turn_idx"].sum()),
        "asst_docs": int((sub["role"] == "assistant").sum()),
    }


def test_scripted_metric_partials_are_per_partition(built_index, src, oracle):
    # no reduce_fn -> the raw shard states, one per partition (ES default
    # reduce); their sum must equal the reduced result regardless of
    # partitioning — the associativity contract
    init, map_batch, combine, _ = _sm_fns()
    partials = built_index.scripted_metric(
        "the", cols=["role", "turn_idx"],
        init_fn=init, map_fn=map_batch, combine_fn=combine,
    )
    assert isinstance(partials, list) and len(partials) >= 1
    hits = _match_set(oracle, ["the"])
    assert sum(p["n"] for p in partials) == len(
        src[src["doc_id"].isin(hits)]
    )


def test_scripted_metric_match_all_and_no_hits(built_index):
    init, map_batch, combine, reduce = _sm_fns()
    # query=None = match_all over live docs
    got = built_index.scripted_metric(
        None, cols=["role", "turn_idx"],
        init_fn=init, map_fn=map_batch, combine_fn=combine, reduce_fn=reduce,
    )
    assert got["n"] == built_index.count()
    # a term not in the dictionary: empty match set, reduce of init states
    empty = built_index.scripted_metric(
        "zzzzunseenterm", cols=["role", "turn_idx"],
        init_fn=init, map_fn=map_batch, combine_fn=combine, reduce_fn=reduce,
    )
    assert empty == {"n": 0, "user_turns": 0, "asst_docs": 0}


def test_scripted_metric_dsl_refuses_painless(built_index):
    from dart_importer_spark.query.dsl import DslError, aggs

    body = {
        "aggs": {
            "m": {
                "scripted_metric": {
                    "init_script": "state.n = 0",
                    "map_script": "state.n += 1",
                    "combine_script": "return state",
                    "reduce_script": "return states",
                }
            }
        }
    }
    with pytest.raises(DslError, match="scripted_metric"):
        aggs(built_index, body)


def test_collapse_inner_hits(built_index, src, oracle):
    got = built_index.collapse(
        "the and", by="role", k=3, inner_hits=2
    ).toPandas()
    s = oracle.scores("the and").merge(src[["doc_id", "role"]], on="doc_id")
    s = s.sort_values(["score", "doc_id"], ascending=[False, True])
    s["hit_rank"] = s.groupby("role").cumcount() + 1
    top = s[s["hit_rank"] == 1].head(3)
    want = (
        s[s["role"].isin(top["role"]) & (s["hit_rank"] <= 2)]
        .merge(
            top[["role", "score", "doc_id"]].rename(
                columns={"score": "gs", "doc_id": "gd"}
            ),
            on="role",
        )
        .sort_values(["gs", "gd", "hit_rank"], ascending=[False, True, True])
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["hit_rank"]) == list(want["hit_rank"])
    assert np.allclose(got["score"], want["score"], atol=1e-9)
    # every group's rank-1 row is that group's best hit
    assert (got.groupby("role")["hit_rank"].min() == 1).all()
    with pytest.raises(ValueError):
        built_index.collapse("the", by="role", inner_hits=0)


def test_sliced_scan_partitions_disjoint_and_complete(built_index, src):
    m = 4
    parts = [
        built_index.scan_df(
            {"slice": {"id": i, "max": m}, "_source": False}
        ).toPandas()
        for i in range(m)
    ]
    ids = [set(p["doc_id"]) for p in parts]
    assert sum(len(s) for s in ids) == len(src)
    assert set().union(*ids) == set(src["doc_id"])
    for i in range(m):
        assert ids[i] == {d for d in src["doc_id"] if d % m == i}
    # slice composes with a query body
    half = built_index.scan_df(
        {
            "slice": {"id": 0, "max": 2},
            "query": {"term": {"role": "assistant"}},
            "_source": False,
        }
    ).toPandas()
    want = src[(src["role"] == "assistant") & (src["doc_id"] % 2 == 0)]
    assert set(half["doc_id"]) == set(want["doc_id"])


def test_sliced_scan_rejects_bad_slice(built_index):
    from dart_importer_spark.query.dsl import DslError

    with pytest.raises(DslError, match="slice"):
        built_index.scan_df({"slice": {"id": 2, "max": 2}})
    with pytest.raises(DslError, match="slice"):
        built_index.scan_df({"slice": {"id": 0}})
    with pytest.raises(DslError, match="slice"):
        built_index.scan_df({"slice": {"id": 0, "max": 2, "field": "nope"}})


def _welch(a, b):
    import statistics

    na, nb = len(a), len(b)
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / na + vb / nb
    t = (ma - mb) / se2 ** 0.5
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, df


def _p_two_tailed_numeric(t, df):
    """Independent check of the engine's incomplete-beta p-value: midpoint
    integration of the t-density over [|t|, inf) via x = |t| + u/(1-u)."""
    import math

    a = abs(t)
    c = math.exp(
        math.lgamma((df + 1) / 2) - math.lgamma(df / 2)
    ) / math.sqrt(df * math.pi)
    n = 20000
    h = 1.0 / n
    s = 0.0
    for i in range(n):
        u = (i + 0.5) * h
        x = a + u / (1.0 - u)
        s += c * (1.0 + x * x / df) ** (-(df + 1) / 2.0) / (1.0 - u) ** 2
    return 2.0 * s * h


def test_t_test_unpaired_and_dsl(built_index, src, oracle):
    """t_test over the match set: Welch (ES default) and pooled t/df vs a
    statistics-module recomputation; p-value vs an independent numeric
    integration of the t-density; the ES body form must equal the engine
    call; degenerate inputs raise."""
    import statistics

    hits = _match_set(oracle, ["the"])
    dl = {int(d): len(t) for d, t in zip(oracle.doc_ids, oracle.tokens)}
    sub = src[src["doc_id"].isin(hits)]
    a = [dl[d] for d in sub[sub["role"] == "user"]["doc_id"]]
    b = [dl[d] for d in sub[sub["role"] == "assistant"]["doc_id"]]
    t, df = _welch(a, b)
    got = built_index.t_test(
        "the", on="dl", by="role", group_a="user", group_b="assistant"
    ).collect()[0]
    assert got["t_stat"] == round(t, 6)
    assert got["deg_f"] == round(df, 6)
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert abs(got["p_value"] - _p_two_tailed_numeric(t, df)) < 2e-6

    na, nb = len(a), len(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    tp = (statistics.fmean(a) - statistics.fmean(b)) / (
        sp2 * (1 / na + 1 / nb)
    ) ** 0.5
    gp = built_index.t_test(
        "the", on="dl", by="role", group_a="user", group_b="assistant",
        test_type="homoscedastic",
    ).collect()[0]
    assert gp["t_stat"] == round(tp, 6)
    assert gp["deg_f"] == float(na + nb - 2)
    assert abs(
        gp["p_value"] - _p_two_tailed_numeric(tp, na + nb - 2)
    ) < 2e-6

    # ES body form == the engine call
    from dart_importer_spark.query.dsl import aggs

    out = aggs(built_index, {
        "query": {"match": {"text": "the"}},
        "aggs": {"tt": {"t_test": {
            "a": {"field": "dl", "filter": {"term": {"role": "user"}}},
            "b": {"field": "dl", "filter": {"term": {"role": "assistant"}}},
            "type": "heteroscedastic",
        }}},
    })["tt"].collect()[0]
    assert out == got

    # paired on identical columns: zero difference variance must raise
    with pytest.raises(ValueError, match="non-zero difference"):
        built_index.t_test("the", on="dl", on_b="dl", test_type="paired")
    with pytest.raises(ValueError, match="empty population"):
        built_index.t_test(
            "the", on="dl", by="role", group_a="user", group_b="nope"
        )
    with pytest.raises(ValueError, match="t_test type"):
        built_index.t_test(
            "the", on="dl", by="role", group_a="user", group_b="assistant",
            test_type="zzz",
        )
