"""categorize_text / variable_width_histogram / normalize / change_point
aggregations and the mining operators (frequent_item_sets,
dup_ngram_stats) — hand-computed expectations on small exact inputs."""

from __future__ import annotations

import pytest

from dart_importer_spark.operators.mining import (
    dup_ngram_stats,
    frequent_item_sets,
)


@pytest.fixture(scope="module")
def cat_index(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [
        # categorize_text drops digit-bearing tokens; first-2-token key
        ("c1", 0, "error code 500 in worker", "error code 500 in worker"),
        ("c1", 1, "error code 404 in worker", "error code 404 in worker"),
        ("c2", 0, "error code 500x in db", "error code 500x in db"),
        ("c2", 1, "retry error now", "retry error now"),
        ("c3", 0, "error", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, raw string"
    )
    out = str(tmp_path_factory.mktemp("cat") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("raw",))
    return InvertedIndex(spark, out)


def test_categorize_text(cat_index):
    got = cat_index.categorize_text(
        "error", on="raw", k=10, max_tokens=2
    ).toPandas()
    # '500'/'404'/'500x' dropped -> 'error code' ×3, 'retry error' ×1;
    # the NULL raw row is excluded
    assert list(got["category"]) == ["error code", "retry error"]
    assert list(got["doc_count"]) == [3, 1]
    with pytest.raises(ValueError):
        cat_index.categorize_text("error", on="raw", max_tokens=0)


def test_categorize_match_all_and_k(cat_index):
    got = cat_index.categorize_text(None, on="raw", k=1, max_tokens=2).toPandas()
    assert list(got["category"]) == ["error code"]


@pytest.fixture(scope="module")
def num_index(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    # 7 docs matching 'x', values 10..70: ntile(3) -> [10,20,30], [40,50], [60,70]
    rows = [("c1", i, "x common", (i + 1) * 10) for i in range(7)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, v long")
    out = str(tmp_path_factory.mktemp("vw") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("v",))
    return InvertedIndex(spark, out)


def test_variable_width_histogram(num_index):
    got = num_index.variable_width_histogram("x", on="v", buckets=3).toPandas()
    assert list(got["min"]) == [10, 40, 60]
    assert list(got["max"]) == [30, 50, 70]
    assert list(got["doc_count"]) == [3, 2, 2]
    assert list(got["centroid"]) == [20.0, 45.0, 65.0]
    with pytest.raises(ValueError):
        num_index.variable_width_histogram("x", on="v", buckets=0)


@pytest.fixture(scope="module")
def ts_index(spark, tmp_path_factory):
    import datetime as dt

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    # day buckets with counts 1, 1, 4 -> change point at day 3
    days = [1, 2, 3, 3, 3, 3]
    rows = [
        ("c1", i, "x common", dt.datetime(2024, 1, d, 6, 0, 0))
        for i, d in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    out = str(tmp_path_factory.mktemp("cp") / "idx")
    build_index(spark, df, out, BuildConfig(n_segments=2, n_buckets=4),
                meta_cols=("ts",))
    return InvertedIndex(spark, out)


def test_normalize_percent_of_sum(ts_index):
    got = ts_index.normalize_pipeline("x", on="ts", interval="day").toPandas()
    assert list(got["doc_count"]) == [1, 1, 4]
    assert [round(v, 6) for v in got["normalized"]] == [
        round(100 / 6, 6), round(100 / 6, 6), round(400 / 6, 6),
    ]
    assert abs(got["normalized"].sum() - 100.0) < 1e-6


def test_normalize_rescale(ts_index):
    got = ts_index.normalize_pipeline(
        "x", on="ts", interval="day", method="rescale_0_1"
    ).toPandas()
    assert list(got["normalized"]) == [0.0, 0.0, 1.0]
    with pytest.raises(ValueError):
        ts_index.normalize_pipeline("x", on="ts", method="bogus")


def test_change_point(ts_index):
    # counts [1, 1, 4]: best split is before the 4 -> bucket 2024-01-03,
    # left mean 1, right mean 4; gain = 2^2/2 + 4^2/1 - 6^2/3 = 6
    # (the other split, [1] vs [1,4], gains only 1 + 25/2 - 12 = 1.5)
    got = ts_index.change_point("x", on="ts", interval="day").toPandas()
    assert len(got) == 1
    assert got["bucket"][0] == "2024-01-03 00:00:00"
    assert got["left_mean"][0] == 1.0
    assert got["right_mean"][0] == 4.0
    assert abs(got["gain"][0] - 6.0) < 1e-9


def test_frequent_item_sets(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # duplicate presence ignored
        (4, "c"), (4, None),
    ]
    df = spark.createDataFrame(rows, "g long, i string")
    got = frequent_item_sets(df, "g", "i", min_support=0.5, max_size=3).toPandas()
    # 4 groups, min_count = 2: a(3), b(3), c(2), a|b(3); a|c and b|c are 1
    want = {("a", 1, 3), ("b", 1, 3), ("c", 1, 2), ("a|b", 2, 3)}
    assert set(zip(got["items"], got["size"], got["support_count"])) == want
    assert got.loc[got["items"] == "a|b", "support"].iloc[0] == 0.75
    # ordered: size asc then support_count desc then items asc
    assert list(got["items"]) == ["a", "b", "c", "a|b"]


def test_frequent_item_sets_triples(spark):
    rows = [(g, i) for g in (1, 2) for i in ("x", "y", "z")] + [(3, "x")]
    df = spark.createDataFrame(rows, "g long, i string")
    got = frequent_item_sets(df, "g", "i", min_support=0.6, max_size=3).toPandas()
    # 3 groups, min_count = 2: x(3), y(2), z(2), all pairs(2), x|y|z(2)
    assert "x|y|z" in set(got["items"])
    assert got.loc[got["items"] == "x|y|z", "support_count"].iloc[0] == 2
    with pytest.raises(ValueError):
        frequent_item_sets(df, "g", "i", min_support=0.0)
    with pytest.raises(ValueError):
        frequent_item_sets(df, "g", "i", max_size=4)


def test_frequent_item_sets_empty(spark):
    df = spark.createDataFrame([], "g long, i string")
    assert frequent_item_sets(df, "g", "i").count() == 0


def test_dup_ngram_stats(spark):
    shared = "one two three four five"
    rows = [
        (0, shared + " alpha beta gamma delta"),
        (1, shared + " epsilon zeta eta theta"),
        (2, "totally different words here nothing shared at all"),
        (3, "tiny"),  # < n tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_ngram_stats(df, "doc_id", "text", n=5, min_df=2).toPandas()
    assert list(got["id"]) == [0, 1, 2]
    # doc 0: 9 tokens -> 5 five-grams; only 'one two three four five'
    # also appears in doc 1
    r0 = got[got["id"] == 0].iloc[0]
    assert r0["n_ngrams"] == 5 and r0["n_dup"] == 1
    assert r0["dup_fraction"] == 0.2
    r2 = got[got["id"] == 2].iloc[0]
    assert r2["n_dup"] == 0 and r2["dup_fraction"] == 0.0
    with pytest.raises(ValueError):
        dup_ngram_stats(df, "doc_id", "text", n=0)


def test_dup_ngram_repeated_within_doc(spark):
    # the same 3-gram repeated WITHIN one doc counts once for df (distinct
    # docs) but each occurrence counts toward that doc's fraction
    rows = [(0, "a b c a b c"), (1, "a b c x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_ngram_stats(df, "doc_id", "text", n=3, min_df=2).toPandas()
    r0 = got[got["id"] == 0].iloc[0]
    # doc 0 trigram occurrences: 'a b c' (×2 at pos 1,4), 'b c a', 'c a b'
    # -> only the two 'a b c' occurrences are shared with doc 1
    assert r0["n_ngrams"] == 4 and r0["n_dup"] == 2
    assert r0["dup_fraction"] == 0.5
