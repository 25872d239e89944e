"""ES|QL surface: parser, relational commands, full-text predicates.

The compiled plan must agree with hand-built DataFrame ops (relational
commands) and with the engine's own scored path (MATCH + METADATA _score
rank/score-identical to InvertedIndex.topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.esql import EsqlEngine, EsqlError, esql


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (0, "en", "src0-a", 120, ["x", "y"]),
        (1, "en", "src1-b", 250, ["x"]),
        (2, "fr", "src2-c", 310, None),
        (3, "de", "src3-d", 80, []),
        (4, "en", "plain", 410, ["z"]),
        (5, None, "src5-e", 150, ["y", "z"]),
    ]
    return spark.createDataFrame(
        rows, "id long, lang string, source string, n int, tags array<string>"
    )


def test_stats_by(spark, tbl):
    out = esql(
        spark,
        'FROM t | WHERE n >= 100 | STATS cnt = COUNT(*), avg_n = ROUND(AVG(n), 2)'
        " BY lang | SORT cnt DESC, lang ASC",
        {"t": tbl},
    ).collect()
    assert [(r["lang"], r["cnt"], r["avg_n"]) for r in out] == [
        ("en", 3, 260.0),
        (None, 1, 150.0),
        ("fr", 1, 310.0),
    ]


def test_stats_no_by_and_median_percentile(spark, tbl):
    r = esql(
        spark,
        "FROM t | STATS med = MEDIAN(n), p50 = PERCENTILE(n, 50), "
        "sd = ROUND(STD_DEV(n), 4), wa = WEIGHTED_AVG(n, id)",
        {"t": tbl},
    ).collect()[0]
    assert r["med"] == r["p50"] == 200.0
    # population stddev of [120,250,310,80,410,150]
    import statistics

    assert r["sd"] == round(statistics.pstdev([120, 250, 310, 80, 410, 150]), 4)
    vals = [(120, 0), (250, 1), (310, 2), (80, 3), (410, 4), (150, 5)]
    assert r["wa"] == pytest.approx(
        sum(v * w for v, w in vals) / sum(w for _, w in vals)
    )


def test_eval_keep_drop_rename_limit(spark, tbl):
    out = esql(
        spark,
        "FROM t | EVAL bucket = FLOOR(n / 100) * 100, up = TO_UPPER(lang) "
        "| KEEP id, b*, up | RENAME up AS lang_up | SORT id | LIMIT 3",
        {"t": tbl},
    )
    assert out.columns == ["id", "bucket", "lang_up"]
    rows = out.collect()
    assert [(r["id"], r["bucket"], r["lang_up"]) for r in rows] == [
        (0, 100, "EN"), (1, 200, "EN"), (2, 300, "FR"),
    ]


def test_where_operators(spark, tbl):
    q = (
        'FROM t | WHERE lang IN ("en", "fr") AND source LIKE "src*" '
        'AND NOT source RLIKE ".*-c" AND n % 2 == 0 | KEEP id | SORT id'
    )
    assert [r["id"] for r in esql(spark, q, {"t": tbl}).collect()] == [0, 1]


def test_is_null_and_case(spark, tbl):
    out = esql(
        spark,
        "FROM t | WHERE lang IS NULL | EVAL k = CASE(n > 100, \"big\", \"small\")"
        " | KEEP id, k",
        {"t": tbl},
    ).collect()
    assert [(r["id"], r["k"]) for r in out] == [(5, "big")]


def test_string_functions(spark, tbl):
    r = esql(
        spark,
        "FROM t | WHERE id == 0 | EVAL a = SUBSTRING(source, 1, 4), "
        'b = LEFT(source, 3), c = RIGHT(source, 1), d = REPLACE(source, "-", "+"), '
        "e = LENGTH(source), f = STARTS_WITH(source, \"src\") | "
        "KEEP a, b, c, d, e, f",
        {"t": tbl},
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"], r["f"]) == (
        "src0", "src", "a", "src0+a", 6, True)


def test_mv_expand_preserves_null_and_empty(spark, tbl):
    out = esql(
        spark,
        "FROM t | MV_EXPAND tags | STATS n = COUNT(*), nn = COUNT(tags)",
        {"t": tbl},
    ).collect()[0]
    # 6 tag values + null row (id=2) + empty-array row (id=3) -> 8 rows
    assert out["n"] == 8 and out["nn"] == 6


def test_dissect(spark, tbl):
    out = esql(
        spark,
        'FROM t | DISSECT source "%{base}-%{suffix}" | KEEP id, base, suffix '
        "| SORT id",
        {"t": tbl},
    ).collect()
    assert (out[0]["base"], out[0]["suffix"]) == ("src0", "a")
    # non-matching row ("plain") -> nulls, not empty strings
    assert out[4]["base"] is None and out[4]["suffix"] is None


def test_enrich_broadcast(spark, tbl):
    policy = spark.createDataFrame(
        [("en", "English", 1), ("fr", "French", 2)],
        "code string, label string, rank int",
    )
    out = esql(
        spark,
        "FROM t | ENRICH langs ON lang WITH name = label | KEEP id, name | SORT id",
        {"t": tbl},
        enrich={"langs": (policy, "code")},
    ).collect()
    assert [r["name"] for r in out] == [
        "English", "English", "French", None, "English", None]


def test_row_source_and_durations(spark):
    r = esql(
        spark,
        'ROW ts = TO_DATETIME("2024-03-05 10:30:00")'
        " | EVAL d = DATE_TRUNC(1 day, ts), h = ts + 2 hours, "
        'm = DATE_EXTRACT("month_of_year", ts)',
        {},
    ).collect()[0]
    assert str(r["d"]) == "2024-03-05 00:00:00"
    assert str(r["h"]) == "2024-03-05 12:30:00"
    assert r["m"] == 3


def test_sort_nulls_and_cast(spark, tbl):
    out = esql(
        spark,
        "FROM t | EVAL half = (n / 2)::LONG | SORT lang ASC NULLS FIRST, id "
        "| KEEP id, half | LIMIT 2",
        {"t": tbl},
    ).collect()
    assert out[0]["id"] == 5 and out[0]["half"] == 75


def test_match_score_rank_identity(spark, built_index):
    eng = EsqlEngine(spark, {"transcripts": built_index})
    got = eng.query(
        "FROM transcripts METADATA _score\n"
        '| WHERE MATCH(text, "the w00100")\n'
        "| EVAL score = ROUND(_score, 6)\n"
        "| KEEP doc_id, score | SORT score DESC, doc_id ASC | LIMIT 10"
    ).collect()
    want = built_index.topk("the w00100", k=10, round_scores=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_match_filter_context_and_negation(spark, built_index):
    eng = EsqlEngine(spark, {"transcripts": built_index})
    n_match = eng.query(
        'FROM transcripts | WHERE MATCH(text, "w00100") | STATS n = COUNT(*)'
    ).collect()[0]["n"]
    n_not = eng.query(
        'FROM transcripts | WHERE NOT MATCH(text, "w00100") | STATS n = COUNT(*)'
    ).collect()[0]["n"]
    total = built_index.doc_stats().count()
    assert n_match > 0 and n_match + n_not == total
    assert n_match == built_index.match_docs("w00100").count()


def test_match_phrase(spark, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    rows = [("p", 0, "x y"), ("p", 1, "x y z x y"),
            ("p", 2, "y x"), ("p", 3, "x z y")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = str(tmp_path_factory.mktemp("esql_mp") / "idx")
    build_index(spark, df, out,
                BuildConfig(n_segments=1, n_buckets=2, store_positions=True),
                meta_cols=())
    ix = InvertedIndex(spark, out)
    eng = EsqlEngine(spark, {"t": ix})
    # filter context: exact-phrase doc set
    n = eng.query(
        'FROM t | WHERE MATCH_PHRASE(text, "x y") | STATS n = COUNT(*)'
    ).collect()[0]["n"]
    assert n == 2  # docs 0 and 1
    n_not = eng.query(
        'FROM t | WHERE NOT MATCH_PHRASE(text, "x y") | STATS n = COUNT(*)'
    ).collect()[0]["n"]
    assert n + n_not == 4
    # METADATA _score: the PhraseQuery BM25 frame, rank-identical to
    # match_phrase_scored
    got = eng.query(
        "FROM t METADATA _score\n"
        '| WHERE MATCH_PHRASE(text, "x y")\n'
        "| EVAL score = ROUND(_score, 6)\n"
        "| KEEP doc_id, score | SORT score DESC, doc_id ASC | LIMIT 10"
    ).collect()
    want = ix.match_phrase_scored("x y", k=10, round_scores=6).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # absent phrase term -> empty scored result, not an error
    empty = eng.query(
        "FROM t METADATA _score\n"
        '| WHERE MATCH_PHRASE(text, "x nope")\n'
        "| STATS n = COUNT(*)"
    ).collect()[0]["n"]
    assert empty == 0


def test_qstr(spark, built_index):
    eng = EsqlEngine(spark, {"transcripts": built_index})
    got = eng.query(
        'FROM transcripts | WHERE QSTR("the AND w00100") | STATS n = COUNT(*)'
    ).collect()[0]["n"]
    want = built_index.match_docs("the w00100", mode="and").count()
    assert got == want


def test_index_source_projects_meta_columns(spark, built_index):
    eng = EsqlEngine(spark, {"transcripts": built_index})
    cols = eng.query("FROM transcripts | LIMIT 1").columns
    assert "doc_id" in cols and "role" in cols and "conv_id" in cols
    # internal columns never leak
    assert "dl" not in cols and "seg" not in cols


def test_errors(spark, tbl, built_index):
    with pytest.raises(EsqlError, match="top-level AND"):
        esql(spark, 'FROM t | WHERE lang == "en" OR MATCH(lang, "x")',
             {"t": tbl})
    with pytest.raises(EsqlError, match="only valid in STATS"):
        esql(spark, "FROM t | EVAL x = SUM(n)", {"t": tbl})
    with pytest.raises(EsqlError, match="no aggregate"):
        esql(spark, "FROM t | STATS x = n + 1", {"t": tbl})
    with pytest.raises(EsqlError, match="unknown index"):
        esql(spark, "FROM nope", {"t": tbl})
    with pytest.raises(EsqlError, match="unknown column"):
        esql(spark, "FROM t | KEEP nope", {"t": tbl})
    with pytest.raises(EsqlError, match="need a single index source"):
        esql(spark, 'FROM t | WHERE MATCH(text, "x")', {"t": tbl})
    with pytest.raises(EsqlError, match="expected a command"):
        esql(spark, "FROM t | FROBNICATE x", {"t": tbl})
    with pytest.raises(EsqlError, match="first command after FROM"):
        EsqlEngine(spark, {"i": built_index}).query(
            'FROM i | WHERE doc_id > 0 | WHERE MATCH(text, "x")'
        )


def test_bucket_numeric_and_time(spark, tbl):
    out = esql(
        spark,
        "FROM t | STATS n = COUNT(*) BY b = BUCKET(n, 100) | SORT b",
        {"t": tbl},
    ).collect()
    assert [(r["b"], r["n"]) for r in out] == [
        (0, 1), (100, 2), (200, 1), (300, 1), (400, 1)]
    r = esql(
        spark,
        'ROW ts = TO_DATETIME("2024-03-05 10:30:00")'
        " | EVAL w = BUCKET(ts, 1 hour)",
        {},
    ).collect()[0]
    assert str(r["w"]) == "2024-03-05 10:00:00"
    with pytest.raises(EsqlError, match="4-arg BUCKET"):
        esql(spark, "FROM t | STATS n = COUNT(*) BY BUCKET(n, 10, 0, 500)",
             {"t": tbl})


def test_grok(spark):
    df = spark.createDataFrame(
        [("alpha 42 10.0.0.1",), ("beta 7 192.168.0.9",), ("nope",)],
        "line string",
    )
    out = esql(
        spark,
        'FROM t | GROK line "%{WORD:name} %{INT:num:int} %{IP:addr}" '
        "| KEEP name, num, addr",
        {"t": df},
    ).collect()
    assert (out[0]["name"], out[0]["num"], out[0]["addr"]) == (
        "alpha", 42, "10.0.0.1")
    assert out[2]["name"] is None and out[2]["num"] is None
    with pytest.raises(EsqlError, match="unknown grok pattern"):
        esql(spark, 'FROM t | GROK line "%{NOPE:x}"', {"t": df})


def test_lookup_join(spark, tbl):
    lk = spark.createDataFrame(
        [("en", "English"), ("fr", "French")], "lang string, label string"
    )
    out = esql(
        spark,
        "FROM t | LOOKUP JOIN langs ON lang | KEEP id, label | SORT id",
        {"t": tbl, "langs": lk},
    ).collect()
    assert [r["label"] for r in out] == [
        "English", "English", "French", None, "English", None]
    # lookup columns replace same-named input columns
    lk2 = spark.createDataFrame([("en", 999)], "lang string, n int")
    out2 = esql(
        spark,
        "FROM t | LOOKUP JOIN langs ON lang | WHERE id == 0 | KEEP n",
        {"t": tbl, "langs": lk2},
    ).collect()
    assert out2[0]["n"] == 999


def test_index_patterns_union(spark, tbl):
    out = esql(spark, "FROM t*, t1 | STATS n = COUNT(*)",
               {"t0": tbl, "t1": tbl}).collect()[0]["n"]
    # t* resolves to both, plus t1 again -> 3x the table
    assert out == 3 * tbl.count()


def test_plan_pushdown_and_no_python(spark, tmp_path):
    """The compiled ES|QL pipeline is ONE Catalyst plan: the WHERE
    predicate reaches the parquet scan as a pushed filter, projection
    prunes unread columns (ReadSchema), and nothing falls back to
    row-wise Python."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, f"s{i}", i * 10) for i in range(100)],
        "id long, s string, n long",
    ).write.parquet(p)
    df = esql(
        spark,
        "FROM t | WHERE n >= 500 | EVAL b = FLOOR(n / 100) * 100 "
        "| STATS c = COUNT(*) BY b",
        {"t": spark.read.parquet(p)},
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(n,500)" in plan
    # the unused string column never leaves the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "n" in read_schema and '"s"' not in read_schema and "s:" not in read_schema


def test_inlinestats(spark, tbl):
    out = esql(
        spark,
        "FROM t | INLINESTATS avg_n = AVG(n) BY lang "
        "| WHERE n > avg_n | KEEP id | SORT id",
        {"t": tbl},
    ).collect()
    # en group avg = (120+250+410)/3 = 260 -> id 4 (410); singleton groups
    # never exceed their own mean
    assert [r["id"] for r in out] == [4]
    # global (no BY) inlinestats
    gdf = esql(
        spark,
        "FROM t | INLINESTATS m = MAX(n) | WHERE n == m | KEEP id",
        {"t": tbl},
    )
    assert [r["id"] for r in gdf.collect()] == [4]
    # the global (no BY) form must NOT be a single-partition window —
    # it aggregates to one row and broadcasts it back
    plan = gdf._sc._jvm.PythonSQLUtils.explainString(
        gdf._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan and "Broadcast" in plan
    with pytest.raises(EsqlError, match="bare aggregates"):
        esql(spark, "FROM t | INLINESTATS x = ROUND(AVG(n), 2)", {"t": tbl})
    with pytest.raises(EsqlError, match="COUNT_DISTINCT"):
        esql(spark, "FROM t | INLINESTATS x = COUNT_DISTINCT(n)", {"t": tbl})


def test_change_point(spark):
    rows = [(k, 10.0 if k <= 12 else 100.0) for k in range(1, 25)]
    df = spark.createDataFrame(rows, "k int, v double")
    out = esql(
        spark,
        "FROM t | CHANGE_POINT v ON k | WHERE type IS NOT NULL | KEEP k, type",
        {"t": df},
    ).collect()
    assert len(out) == 1
    assert out[0]["k"] == 13 and out[0]["type"] == "step_change"
    # row count preserved, marker null elsewhere
    all_rows = esql(spark, "FROM t | CHANGE_POINT v ON k AS cls, score",
                    {"t": df}).collect()
    assert len(all_rows) == len(rows)
    assert sum(1 for r in all_rows if r["cls"] is not None) == 1


def test_topk_pushdown_rank_identity(spark, built_index):
    """The narrow SORT _score DESC | LIMIT k rewrite must fire AND be
    rank/score-identical to the general (unpruned) path, with and
    without a relational conjunct."""
    q = (
        "FROM transcripts METADATA _score\n"
        '| WHERE MATCH(text, "the w00100") AND role == "assistant"\n'
        "| EVAL s = ROUND(_score, 6)\n"
        "| SORT _score DESC, doc_id ASC | LIMIT 10 | KEEP doc_id, s"
    )
    fast = EsqlEngine(spark, {"transcripts": built_index})
    slow = EsqlEngine(spark, {"transcripts": built_index}, pushdown=False)
    got = fast.query(q)
    assert fast.last_pushdown is True
    want = slow.query(q)
    assert slow.last_pushdown is False
    assert [(r["doc_id"], r["s"]) for r in got.collect()] == [
        (r["doc_id"], r["s"]) for r in want.collect()
    ]
    # shapes the rewrite must NOT claim: sort not on _score; extra sort
    # key; negated match; QSTR; no limit
    for nq in (
        'FROM transcripts METADATA _score | WHERE MATCH(text, "the") '
        "| SORT doc_id ASC | LIMIT 5",
        'FROM transcripts METADATA _score | WHERE MATCH(text, "the") '
        "| SORT _score DESC, ts ASC | LIMIT 5",
        'FROM transcripts METADATA _score | WHERE NOT MATCH(text, "the") '
        "| SORT _score DESC | LIMIT 5",
        'FROM transcripts METADATA _score | WHERE MATCH(text, "the") '
        "| SORT _score DESC",
    ):
        fast.query(nq)
        assert fast.last_pushdown is False, nq


def test_enrich_replaces_colliding_columns(spark, tbl):
    policy = spark.createDataFrame(
        [("en", 777)], "code string, n int"  # collides with input 'n'
    )
    out = esql(
        spark,
        "FROM t | ENRICH langs ON lang | WHERE id == 0 | KEEP id, n",
        {"t": tbl},
        enrich={"langs": (policy, "code")},
    ).collect()
    assert out[0]["n"] == 777


def test_categorize_and_mv_functions(spark):
    df = spark.createDataFrame(
        [("Failed to connect to host 10.2.3.4 port 8080",),
         ("Failed to connect to host 10.9.9.9 port 9090",),
         ("User admin logged in",)],
        "msg string",
    )
    out = esql(
        spark,
        "FROM t | STATS n = COUNT(*) BY c = CATEGORIZE(msg) | SORT n DESC",
        {"t": df},
    ).collect()
    assert (out[0]["c"], out[0]["n"]) == ("failed to connect to host", 2)
    r = esql(
        spark,
        "ROW a = 1 | EVAL p = ROUND(PI(), 4)",
        {},
    ).collect()[0]
    assert r["p"] == 3.1416
    df2 = spark.createDataFrame([([10, 20, 30, 40],)], "xs array<int>")
    r2 = esql(
        spark,
        "FROM t | EVAL f = MV_FIRST(xs), l = MV_LAST(xs), "
        "s = MV_SLICE(xs, 1, 2)",
        {"t": df2},
    ).collect()[0]
    assert (r2["f"], r2["l"], r2["s"]) == (10, 40, [20, 30])


def test_fork(spark, tbl):
    out = esql(
        spark,
        'FROM t | FORK (WHERE lang == "en" | SORT n DESC | LIMIT 2) '
        "(STATS total = COUNT(*)) | KEEP id, n, total, _fork",
        {"t": tbl},
    ).toPandas()
    f1 = out[out["_fork"] == "fork1"]
    f2 = out[out["_fork"] == "fork2"]
    assert sorted(f1["n"]) == [250, 410] and f1["total"].isna().all()
    assert list(f2["total"]) == [6] and f2["id"].isna().all()
    with pytest.raises(EsqlError, match="at least two"):
        esql(spark, "FROM t | FORK (LIMIT 1)", {"t": tbl})
    with pytest.raises(EsqlError, match="cannot nest"):
        esql(spark, "FROM t | FORK (LIMIT 1) (FORK (LIMIT 1) (LIMIT 2))",
             {"t": tbl})


def test_pushdown_bails_when_score_rebound(spark, built_index):
    """Commands between WHERE and SORT that (re)bind _score or doc_id
    must disable the top-k rewrite (the sort keys no longer mean the
    BM25 score)."""
    eng = EsqlEngine(spark, {"transcripts": built_index})
    # DISSECT introducing a column literally named _score
    eng.query(
        'FROM transcripts METADATA _score | WHERE MATCH(text, "the") '
        '| DISSECT role "%{_score}" | SORT _score DESC | LIMIT 3'
    )
    assert eng.last_pushdown is False
    # the clean shape still claims
    eng.query(
        'FROM transcripts METADATA _score | WHERE MATCH(text, "the") '
        '| DISSECT role "%{r2}" | SORT _score DESC | LIMIT 3'
    )
    assert eng.last_pushdown is True


def test_sample(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = esql(spark, "FROM t | SAMPLE 0.3 | STATS n = COUNT(*)",
             {"t": df}).collect()[0]["n"]
    b = esql(spark, "FROM t | SAMPLE 0.3 | STATS n = COUNT(*)",
             {"t": df}).collect()[0]["n"]
    assert a == b  # deterministic
    assert 0.2 * 2000 < a < 0.4 * 2000  # near the target probability
    ids0 = {r["id"] for r in esql(
        spark, "FROM t | SAMPLE 0.3", {"t": df}).collect()}
    ids7 = {r["id"] for r in esql(
        spark, "FROM t | SAMPLE 0.3, 7", {"t": df}).collect()}
    assert ids0 != ids7  # different seed -> different membership
    with pytest.raises(EsqlError, match="probability"):
        esql(spark, "FROM t | SAMPLE 1.5", {"t": df})


def test_knn_threshold_ties_and_negation(spark):
    """KNN(field, [q], k): exact cosine k-nearest with boundary TIES
    INCLUDED (rank() <= k — the deterministic contract); NOT KNN keeps
    the complement plus null-vector rows (ES must_not keeps docs missing
    the field)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),        # exact duplicate of 0: ties at cos=1
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.5, 0.5]),
        (5, None),              # missing vector
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = [r["id"] for r in esql(
        spark, "FROM t | WHERE KNN(v, [1.0, 0.0], 3) | KEEP id | SORT id",
        {"t": df}).collect()]
    assert got == [0, 1, 2]
    # k=1 boundary cuts through the 0/1 tie: both stay
    tied = [r["id"] for r in esql(
        spark, "FROM t | WHERE KNN(v, [1.0, 0.0], 1) | KEEP id | SORT id",
        {"t": df}).collect()]
    assert tied == [0, 1]
    # negation = complement + the null-vector row
    anti = [r["id"] for r in esql(
        spark, "FROM t | WHERE NOT KNN(v, [1.0, 0.0], 3) | KEEP id | SORT id",
        {"t": df}).collect()]
    assert anti == [3, 4, 5]
    # METADATA _score carries the similarity
    s = esql(
        spark,
        "FROM t METADATA _score | WHERE KNN(v, [0.0, 1.0], 1) "
        "| EVAL s = ROUND(_score, 4) | KEEP id, s",
        {"t": df}).collect()
    assert [(r["id"], r["s"]) for r in s] == [(3, 1.0)]
    # same-clause relational conjuncts PRE-filter the knn (ES|QL): the k
    # nearest among id >= 3 is id 4 (cos .707 beats id 3's 0) — a global
    # top-k-then-intersect would return nothing
    pre = [r["id"] for r in esql(
        spark, "FROM t | WHERE KNN(v, [1.0, 0.0], 1) AND id >= 3 "
        "| KEEP id | SORT id", {"t": df}).collect()]
    assert pre == [4]
    # degenerate pre-filtered relation (only the null-vector row): nothing
    # is near, so NOT KNN keeps the row
    deg = [r["id"] for r in esql(
        spark, "FROM t | WHERE NOT KNN(v, [1.0, 0.0], 2) AND id == 5 "
        "| KEEP id", {"t": df}).collect()]
    assert deg == [5]
    with pytest.raises(EsqlError, match="KNN cannot share"):
        esql(spark, 'FROM t | WHERE KNN(v, [1.0, 0.0], 2) AND MATCH(x, "y")',
             {"t": df})
    with pytest.raises(EsqlError, match="numeric literals"):
        esql(spark, "FROM t | WHERE KNN(v, [1.0, id], 2)", {"t": df})


def test_fuse_rrf_matches_hybrid_rrf(spark, built_index):
    """FORK (lexical MATCH) (LOOKUP-joined KNN) | FUSE must reproduce the
    engine's hybrid_rrf exactly: same rounded-rank convention, same
    1/(60+rank) sum. Branches are unbounded (window >= corpus) so there
    is no cut boundary and the identity is exact."""
    ds = built_index.doc_stats().select("doc_id")
    n = ds.count()
    emb = ds.select(
        "doc_id",
        F.array(
            (F.pmod(F.col("doc_id") * 2654435761, F.lit(1000)).cast("double") / 500.0) - 1.0,
            (F.pmod(F.col("doc_id") * 40503, F.lit(997)).cast("double") / 498.5) - 1.0,
            (F.pmod(F.col("doc_id") * 97, F.lit(89)).cast("double") / 44.5) - 1.0,
        ).alias("embedding"),
    )
    qvec = [0.25, -0.5, 0.75]
    eng = EsqlEngine(spark, {"transcripts": built_index, "emb": emb})
    got = eng.query(
        "FROM transcripts METADATA _score\n"
        '| FORK (WHERE MATCH(text, "the w00100"))\n'
        f"       (LOOKUP JOIN emb ON doc_id | WHERE KNN(embedding, "
        f"[{', '.join(map(str, qvec))}], {n}))\n"
        "| FUSE | EVAL score = ROUND(_score, 6)\n"
        "| KEEP doc_id, score | SORT score DESC, doc_id ASC | LIMIT 10"
    ).collect()
    want = built_index.hybrid_rrf(
        "the w00100", qvec, emb, k=10, window=n, id_col="doc_id"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_fuse_linear_and_errors(spark):
    rows = [(0, 10.0, "a"), (1, 9.0, "a"), (2, 8.0, "b"), (3, 7.0, "b")]
    df = spark.createDataFrame(rows, "doc_id long, w double, g string")
    out = esql(
        spark,
        'FROM t METADATA _score\n'
        '| FORK (WHERE g == "a" | EVAL _score = w)'
        ' (WHERE doc_id < 2 | EVAL _score = 100.0)\n'
        "| FUSE linear | KEEP doc_id, _score | SORT doc_id",
        {"t": df},
    ).collect()
    assert [(r["doc_id"], r["_score"]) for r in out] == [
        (0, 110.0), (1, 109.0)
    ]
    with pytest.raises(EsqlError, match="must follow FORK"):
        esql(spark, "FROM t METADATA _score | FUSE", {"t": df})
    with pytest.raises(EsqlError, match="rrf or linear"):
        esql(spark, "FROM t METADATA _score | FUSE dbsf", {"t": df})
    with pytest.raises(Exception, match="non-null _score"):
        # branch 2 collapses to a STATS row with null doc_id/_score slots;
        # the guard is a lazy in-plan raise_error (an eager count() would
        # run the whole FORK pipeline twice), so it fires at the action
        esql(
            spark,
            "FROM t METADATA _score\n"
            "| FORK (EVAL _score = w) (STATS n = COUNT(*))\n"
            "| FUSE",
            {"t": df},
        ).collect()


def test_rerank_builtin_and_registered(spark):
    """RERANK: builtin deterministic overlap scorer (no inference id) and
    the registered-callable path (Arrow-batched pandas UDF); target
    defaults to _score, named targets work; unknown ids raise."""
    df = spark.createDataFrame(
        [(0, "data merge filter window"), (1, "data scan"), (2, "none here")],
        "id long, text string",
    )
    got = esql(
        spark,
        'FROM t METADATA _score | RERANK "data merge" ON text\n'
        "| EVAL s = ROUND(_score, 3) | KEEP id, s | SORT s DESC, id ASC",
        {"t": df},
    ).collect()
    assert [(r["id"], r["s"]) for r in got] == [(0, 1.0), (1, 0.5), (2, 0.0)]

    def length_scorer(query, texts):
        return texts.str.len().astype("float64")

    got2 = esql(
        spark,
        'FROM t | RERANK sc = "x" ON text WITH len_model | KEEP id, sc | SORT id',
        {"t": df},
        inference={"len_model": length_scorer},
    ).collect()
    assert [(r["id"], r["sc"]) for r in got2] == [
        (0, 24.0), (1, 9.0), (2, 9.0)
    ]
    with pytest.raises(EsqlError, match="not registered"):
        esql(spark, 'FROM t | RERANK "q" ON text WITH nope', {"t": df})
    with pytest.raises(EsqlError, match="no tokens"):
        esql(spark, 'FROM t | RERANK "," ON text', {"t": df})


def test_completion_stub_and_registered(spark):
    df = spark.createDataFrame([(0, "alpha beta"), (1, "gamma")],
                               "id long, text string")
    got = esql(
        spark,
        'FROM t | COMPLETION head = CONCAT("sum: ", text) WITH stub\n'
        "| KEEP id, head | SORT id",
        {"t": df},
    ).collect()
    assert [r["head"] for r in got] == ["[stub] sum: alpha beta", "[stub] sum: gamma"]

    def echo4(prompts):
        return prompts.str.slice(0, 4) + "!"

    got2 = esql(
        spark,
        "FROM t | COMPLETION o = text WITH g | KEEP id, o | SORT id",
        {"t": df},
        inference={"g": echo4},
    ).collect()
    assert [r["o"] for r in got2] == ["alph!", "gamm!"]
    with pytest.raises(EsqlError, match="not registered"):
        esql(spark, "FROM t | COMPLETION text WITH nope", {"t": df})


def test_stats_where_filters(spark):
    """ES|QL 8.16 per-aggregate WHERE: each condition filters only its own
    aggregate's input, inside ONE groupBy (no per-condition scans); also
    valid on INLINESTATS window aggregates."""
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 600), (3, "b", 700), (4, "b", 20), (5, "b", 900)],
        "id long, g string, n int",
    )
    r = esql(
        spark,
        "FROM t | STATS c = COUNT(*), cl = COUNT(*) WHERE n > 500,\n"
        "  al = ROUND(AVG(n), 2) WHERE n > 500, s = SUM(n) WHERE n < 100\n"
        "  BY g | SORT g",
        {"t": df},
    ).collect()
    assert [(x["g"], x["c"], x["cl"], x["al"], x["s"]) for x in r] == [
        ("a", 2, 1, 600.0, 10),
        ("b", 3, 2, 800.0, 20),
    ]
    # unnamed filtered aggregates default-name from the FULL item text
    # (incl. the WHERE), so two filtered copies stay distinct columns
    rn = esql(
        spark,
        "FROM t | STATS COUNT(*) WHERE n > 500, COUNT(*) WHERE n < 100",
        {"t": df},
    )
    assert rn.columns == ["COUNT(*) WHERE n > 500", "COUNT(*) WHERE n < 100"]
    assert [tuple(x) for x in rn.collect()] == [(3, 2)]
    # empty filter group -> null aggregate, zero count (SQL FILTER semantics)
    r2 = esql(
        spark,
        'FROM t | STATS m = MAX(n) WHERE g == "zzz", c = COUNT(*) WHERE g == "zzz"',
        {"t": df},
    ).collect()[0]
    assert r2["m"] is None and r2["c"] == 0
    r3 = esql(
        spark,
        "FROM t | INLINESTATS m = MAX(n) WHERE n < 800 BY g | KEEP id, m | SORT id",
        {"t": df},
    ).collect()
    assert [(x["id"], x["m"]) for x in r3] == [
        (1, 600), (2, 600), (3, 700), (4, 700), (5, 700)
    ]


def test_scalar_function_batch(spark, tbl):
    """Part-16 scalar fill-in: trig/cbrt/hypot, DATE_DIFF fixed units,
    string reverse/repeat/space, byte/bit lengths, HASH dispatch, and the
    mv_median / mv_zip ES edge semantics (even-count integral inputs round
    the middle-pair average down, floats keep the true average; dangling
    mv_zip element stands alone)."""
    r = esql(
        spark,
        'ROW s = "abc", t1 = "2024-01-01"::DATETIME, t2 = "2024-01-03"::DATETIME\n'
        '| EVAL a = ROUND(SIN(PI() / 2), 6), b = ROUND(ATAN2(1.0, 1.0), 6),\n'
        "  c = CBRT(27.0), hy = HYPOT(3.0, 4.0), deg = TO_DEGREES(PI()),\n"
        '  dd = DATE_DIFF("days", t1, t2), rev = REVERSE(s), rep = REPEAT(s, 2),\n'
        '  sp = LENGTH(SPACE(3)), ti = TO_INTEGER("42"), bl = BIT_LENGTH("ab"),\n'
        '  byl = BYTE_LENGTH("가"), hq = HASH("sha256", "x") == SHA256("x"),\n'
        "  mm = MV_MEDIAN([1, 2, 3, 10]), modd = MV_MEDIAN([1, 2, 50]),\n"
        "  mmf = MV_MEDIAN([1.0, 2.0]),\n"
        "  ma = MV_COUNT(MV_APPEND([1, 2], [3])),\n"
        '  mz = MV_JOIN(MV_ZIP(["a", "b", "c"], ["1", "2"], "-"), "|")',
        {"t": spark.range(1)},
    ).collect()[0]
    assert (r["a"], r["b"], r["c"], r["hy"], r["deg"]) == (
        1.0, 0.785398, 3.0, 5.0, 180.0
    )
    assert (r["dd"], r["rev"], r["rep"], r["sp"], r["ti"]) == (
        2, "cba", "abcabc", 3, 42
    )
    assert (r["bl"], r["byl"], r["hq"]) == (16, 3, True)
    assert (r["mm"], r["modd"], r["ma"], r["mz"]) == (2.0, 2.0, 3, "a-1|b-2|c")
    assert r["mmf"] == 1.5
    with pytest.raises(EsqlError, match="DATE_DIFF unit"):
        esql(spark, 'ROW x = 1 | EVAL d = DATE_DIFF("months", x, x)',
             {"t": spark.range(1)})
    with pytest.raises(EsqlError, match="HASH algorithm"):
        esql(spark, 'ROW x = "a" | EVAL h = HASH("crc99", x)',
             {"t": spark.range(1)})


# -- TS (time-series mode, 8.19) ---------------------------------------------

@pytest.fixture(scope="module")
def ts_engine(spark):
    import datetime as dt

    from dart_importer_spark.query.esql import TsSpec

    base = dt.datetime(2024, 1, 1)
    vals1 = [1.0, 5.0, 3.0, 7.0]      # gauge, series (1, click)
    vals2 = [10.0, 12.0, 2.0, 9.0]    # counter with a reset, series (2, click)
    rows = []
    for i, (v1, v2) in enumerate(zip(vals1, vals2)):
        ts = base + dt.timedelta(hours=12 * i)
        rows.append((1, "click", ts, v1))
        rows.append((2, "click", ts, v2))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    return EsqlEngine(
        spark, {"ev": TsSpec(df, ("user_id", "event_type"), "ts")}
    )


def test_ts_over_time_two_level(ts_engine):
    """TS STATS: inner *_over_time per series (dims + bucket), outer across
    series per BY group; plain aggregates (COUNT(*)) stay raw-row grain
    and join back — every value hand-computed."""
    r = ts_engine.query(
        "TS ev | STATS mx = MAX(MAX_OVER_TIME(value)),"
        " av = ROUND(AVG(AVG_OVER_TIME(value)), 2), n = COUNT(*),"
        " f = SUM(FIRST_OVER_TIME(value)), l = SUM(LAST_OVER_TIME(value)),"
        " s = SUM(SUM_OVER_TIME(value)), c = SUM(COUNT_OVER_TIME(value))"
        " BY event_type, b = BUCKET(ts, 1 day) | SORT b"
    ).collect()
    got = [
        (str(x["b"].date()), x["mx"], x["av"], x["n"], x["f"], x["l"],
         x["s"], x["c"])
        for x in r
    ]
    # day1: series (1): 1,5  (2): 10,12 -> maxes 5/12, avgs 3/11,
    #       firsts 1/10, lasts 5/12, sums 6/22, counts 2/2
    # day2: series (1): 3,7  (2): 2,9
    assert got == [
        ("2024-01-01", 12.0, 7.0, 4, 11.0, 17.0, 28.0, 4),
        ("2024-01-02", 9.0, 5.25, 4, 5.0, 16.0, 21.0, 4),
    ]
    # no-bucket form: over_time spans each series' whole range
    (g,) = ts_engine.query(
        "TS ev | STATS mx = MAX(MAX_OVER_TIME(value)),"
        " mn = MIN(MIN_OVER_TIME(value)) BY event_type"
    ).collect()
    assert (g["mx"], g["mn"]) == (12.0, 1.0)
    # per-aggregate WHERE filters the raw rows feeding the inner agg
    (w,) = ts_engine.query(
        "TS ev | STATS mx = MAX(MAX_OVER_TIME(value)) WHERE user_id == 1"
        " BY event_type"
    ).collect()
    assert w["mx"] == 7.0


def test_ts_rate_and_guards(ts_engine, spark):
    """RATE: within-bucket positive-delta sum / bucket span (documented
    deviation: no extrapolation); cross-bucket deltas never counted.
    Guards: over_time outside TS, bare over_time, raw+series mixing,
    TS on a plain table, RATE without a bucket / with WHERE."""
    rr = ts_engine.query(
        "TS ev | STATS r = SUM(RATE(value)) BY b = BUCKET(ts, 1 day)"
        " | SORT b"
    ).collect()
    # day1 deltas: (1): +4, (2): +2 -> 6/86400; day2: +4, +7 -> 11/86400
    assert [x["r"] for x in rr] == [6 / 86400, 11 / 86400]
    with pytest.raises(EsqlError, match="need a TS source"):
        ts_engine.query("FROM ev | STATS MAX(MAX_OVER_TIME(value))")
    with pytest.raises(EsqlError, match="outer aggregate"):
        ts_engine.query("TS ev | STATS MAX_OVER_TIME(value) BY event_type")
    with pytest.raises(EsqlError, match="mixes a raw-row"):
        ts_engine.query(
            "TS ev | STATS x = SUM(value) + MAX(MAX_OVER_TIME(value))"
        )
    with pytest.raises(EsqlError, match="unit-span BUCKET"):
        ts_engine.query("TS ev | STATS SUM(RATE(value))")
    with pytest.raises(EsqlError, match="WHERE is unsupported"):
        ts_engine.query(
            "TS ev | STATS r = SUM(RATE(value)) WHERE user_id == 1"
            " BY b = BUCKET(ts, 1 day)"
        )
    with pytest.raises(EsqlError, match="must be a dimension"):
        ts_engine.query(
            "TS ev | STATS MAX(MAX_OVER_TIME(value)) BY value"
        )
    with pytest.raises(EsqlError, match="TsSpec-registered"):
        esql(spark, "TS t | STATS MAX(MAX_OVER_TIME(x))",
             {"t": spark.range(1)})
    with pytest.raises(EsqlError, match="over the timestamp"):
        # a numeric BUCKET on a metric column would silently split series
        ts_engine.query(
            "TS ev | STATS MAX(MAX_OVER_TIME(value)) BY b = BUCKET(value, 5)"
        )
    # FROM on a TS-registered source reads the plain table
    assert ts_engine.query("FROM ev | STATS n = COUNT(*)").collect()[0][
        "n"] == 8


def test_ts_null_dimension_group(spark):
    """A null dimension value is ONE group: the plain-item join back onto
    the series aggregate must be null-safe (an equi-join would split it
    into two half-null rows)."""
    import datetime as dt

    from dart_importer_spark.query.esql import TsSpec

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a", t0, 1.0), (1, "a", t0 + dt.timedelta(hours=1), 3.0),
        (2, None, t0, 5.0), (2, None, t0 + dt.timedelta(hours=1), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "uid long, kind string, ts timestamp, v double"
    )
    eng = EsqlEngine(spark, {"m": TsSpec(df, ("uid", "kind"), "ts")})
    out = eng.query(
        "TS m | STATS mx = MAX(MAX_OVER_TIME(v)), n = COUNT(*) BY kind"
        " | SORT kind"
    ).collect()
    assert [(x["kind"], x["mx"], x["n"]) for x in out] == [
        (None, 9.0, 2), ("a", 3.0, 2),
    ]


def test_scalar_batch_p17(spark):
    """date_parse / base64 pair / mv_concat (+ the mv_join alias) /
    mv_median_absolute_deviation / mv_percentile / IPv4 family — every
    value hand-computed; invalid IPv4 and unparseable dates yield null
    (ES: null + warning header)."""
    r = esql(
        spark,
        'ROW s = "2024-03-05 10:30:00", ip = "10.1.2.200", bad = "10.1.2.999"\n'
        '| EVAL d = DATE_PARSE("yyyy-MM-dd HH:mm:ss", s),\n'
        '  dbad = DATE_PARSE("yyyy-MM-dd", "nope"),\n'
        '  b64 = TO_BASE64("ab"), rt = FROM_BASE64(TO_BASE64("héllo")),\n'
        '  mc = MV_CONCAT(["a", "b"], "-"), mj = MV_JOIN(["a", "b"], "-"),\n'
        "  mad = MV_MEDIAN_ABSOLUTE_DEVIATION([1.0, 2.0, 4.0, 9.0]),\n"
        "  p25 = MV_PERCENTILE([0.0, 10.0, 20.0, 30.0], 25),\n"
        "  p100 = MV_PERCENTILE([0.0, 10.0], 100),\n"
        "  okip = TO_IP(ip), badip = TO_IP(bad),\n"
        '  cm = CIDR_MATCH(ip, "10.1.0.0/16"),\n'
        '  cm2 = CIDR_MATCH(ip, "192.168.0.0/16", "10.1.2.192/26"),\n'
        '  cmf = CIDR_MATCH(ip, "10.2.0.0/16"), cmb = CIDR_MATCH(bad, "0.0.0.0/0"),\n'
        "  pf = IP_PREFIX(ip, 24, 0), pf2 = IP_PREFIX(ip, 26, 0),\n"
        "  pfa = IP_PREFIX(ip, 32, 0), pf0 = IP_PREFIX(ip, 0, 0)",
        {"t": spark.range(1)},
    ).collect()[0]
    assert str(r["d"]) == "2024-03-05 10:30:00" and r["dbad"] is None
    assert r["b64"] == "YWI=" and r["rt"] == "héllo"
    assert r["mc"] == "a-b" and r["mj"] == "a-b"
    # median([1,2,4,9]) = 3; |x-3| = [2,1,1,6]; median = 1.5
    assert r["mad"] == 1.5
    # linear interpolation: rank 0.25*(4-1) = 0.75 -> 0 + 0.75*(10-0)
    assert r["p25"] == 7.5 and r["p100"] == 10.0
    assert r["okip"] == "10.1.2.200" and r["badip"] is None
    assert (r["cm"], r["cm2"], r["cmf"], r["cmb"]) == (
        True, True, False, None)
    # 10.1.2.200: /24 -> 10.1.2.0; /26 -> .192; /32 identity; /0 zeroes
    assert (r["pf"], r["pf2"], r["pfa"], r["pf0"]) == (
        "10.1.2.0", "10.1.2.192", "10.1.2.200", "0.0.0.0")
    with pytest.raises(EsqlError, match="CIDR"):
        esql(spark, 'ROW x = "1.2.3.4" | EVAL c = CIDR_MATCH(x, "1.2.3.4")',
             {"t": spark.range(1)})
    with pytest.raises(EsqlError, match="out of range"):
        esql(spark, 'ROW x = "1.2.3.4" | EVAL c = IP_PREFIX(x, 33, 0)',
             {"t": spark.range(1)})


def test_ts_grain_consumed_by_plain_stats(ts_engine):
    # a plain STATS consumes the per-series grain: chaining *_over_time
    # after it must error, not silently re-aggregate aggregated rows
    with pytest.raises(EsqlError, match="need a TS source"):
        ts_engine.query(
            "TS ev | STATS v = MAX(value) BY user_id, event_type,"
            " b = BUCKET(ts, 1 day)"
            " | STATS mx = MAX(MAX_OVER_TIME(v)) BY event_type"
        )


def test_ts_by_key_timestamp_collision_rejected(ts_engine):
    # BY ts = BUCKET(ts, ...) would overwrite the raw timestamp before
    # the RATE/FIRST/LAST windows order by it — refused
    with pytest.raises(EsqlError, match="collides with the timestamp"):
        ts_engine.query(
            "TS ev | STATS r = SUM(RATE(value))"
            " BY event_type, ts = BUCKET(ts, 1 day)"
        )


def test_sample_chained_commands_independent(spark):
    # two chained SAMPLE 0.5 must compose (~p1*p2 kept), not re-test the
    # same hash (which kept ~p1) — the ordinal is mixed into the seed
    df = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    one = esql(spark, "FROM t | SAMPLE 0.5 | STATS n = COUNT(*)",
               {"t": df}).collect()[0]["n"]
    two = esql(spark, "FROM t | SAMPLE 0.5 | SAMPLE 0.5 | STATS n = COUNT(*)",
               {"t": df}).collect()[0]["n"]
    assert 0.4 * 4000 < one < 0.6 * 4000
    assert 0.15 * 4000 < two < 0.35 * 4000
    assert two < one


def test_enrich_replaces_key_named_policy_field(spark, tbl):
    # a policy field named like the join key must REPLACE the input
    # column (ES enrich contract), not produce an ambiguous duplicate
    policy = spark.createDataFrame(
        [("en", "english-full", 1), ("fr", "french-full", 2)],
        "code string, lang string, rank int",
    )
    out = esql(
        spark,
        "FROM t | ENRICH langs ON lang | SORT id | KEEP id, lang",
        {"t": tbl},
        enrich={"langs": (policy, "code")},
    ).collect()
    langs = [r["lang"] for r in out]
    assert "english-full" in langs  # replaced with the policy's value
    assert all(v in ("english-full", "french-full", None) for v in langs)
