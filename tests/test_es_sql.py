"""ES SQL endpoint: the statement is Spark SQL (a strict superset of
the ES SQL dialect — ES translates SQL to query DSL, this engine's
planner IS a SQL engine); only MATCH()/QUERY()/SCORE() dispatch into
the index. Contracts under test: predicate columns equal the engine's
match sets, SCORE() ordering equals topk, options/multi-field/superset
forms work, and malformed statements refuse with named reasons."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.dsl import DslError


def test_sql_group_by_match(built_index):
    ix = built_index
    got = ix.sql(
        "SELECT role, count(*) AS n FROM idx WHERE MATCH(text, 'the') "
        "GROUP BY role ORDER BY role"
    ).collect()
    want = (
        ix.match_docs("the")
        .join(ix.doc_stats(), "doc_id")
        .groupBy("role").count().withColumnRenamed("count", "n")
        .orderBy("role").collect()
    )
    assert [(r["role"], r["n"]) for r in got] == \
        [(r["role"], r["n"]) for r in want]
    assert len(got) > 0


def test_sql_score_equals_topk(built_index):
    ix = built_index
    got = ix.sql(
        "SELECT doc_id, SCORE() AS s FROM idx "
        "WHERE MATCH(text, 'the and') ORDER BY s DESC, doc_id LIMIT 7",
        round_scores=6,
    ).collect()
    want = ix.topk("the and", k=7, round_scores=6).collect()
    assert [(r["doc_id"], r["s"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]


def test_sql_match_options_and_multifield_union(built_index):
    ix = built_index
    n_and = ix.sql(
        "SELECT count(*) AS n FROM idx "
        "WHERE MATCH(text, 'the and', 'operator=and')"
    ).collect()[0]["n"]
    assert n_and == ix.match_docs("the and", mode="and").count()
    # multi-field MATCH is the union of per-field sets (here text twice:
    # the union path must dedup back to the single-field count)
    n_u = ix.sql(
        "SELECT count(*) AS n FROM idx WHERE MATCH(text,text, 'the')"
    ).collect()[0]["n"]
    assert n_u == ix.match_docs("the").count()


def test_sql_query_string_predicate(built_index):
    ix = built_index
    n = ix.sql(
        "SELECT count(*) AS n FROM idx WHERE QUERY('the AND w00010')"
    ).collect()[0]["n"]
    assert n == ix.query_string("the AND w00010", k=10**6).count() > 0


def test_sql_superset_join_other_view(built_index, spark):
    ix = built_index
    spark.createDataFrame(
        [("user", 2.0), ("assistant", 3.0), ("tool", 5.0)],
        "role string, w double",
    ).createOrReplaceTempView("role_weights")
    got = ix.sql(
        "SELECT t.role, count(*) * max(rw.w) AS wn FROM idx t "
        "JOIN role_weights rw ON t.role = rw.role "
        "WHERE MATCH(text, 'the') GROUP BY t.role ORDER BY t.role"
    ).collect()
    base = {
        r["role"]: r["n"]
        for r in ix.match_docs("the").join(ix.doc_stats(), "doc_id")
        .groupBy("role").agg(F.count("*").alias("n")).collect()
    }
    w = {"user": 2.0, "assistant": 3.0, "tool": 5.0}
    assert {r["role"]: r["wn"] for r in got} == \
        {k: n * w[k] for k, n in base.items() if k in w}


def test_sql_runtime_fields_visible(built_index):
    rix = built_index.with_runtime_fields({"is_user": "role = 'user'"})
    n = rix.sql(
        "SELECT count(*) AS n FROM idx WHERE MATCH(text, 'the') AND is_user"
    ).collect()[0]["n"]
    want = built_index.match_docs(
        "the", filters=F.col("role") == "user"
    ).count()
    assert n == want > 0


def test_sql_refusals(built_index):
    ix = built_index
    with pytest.raises(DslError, match="exactly one MATCH"):
        ix.sql("SELECT SCORE() FROM idx")
    with pytest.raises(DslError, match="exactly one MATCH"):
        ix.sql("SELECT SCORE() FROM idx WHERE MATCH(text,'a') "
               "AND MATCH(text,'b')")
    with pytest.raises(DslError, match="unsupported MATCH option"):
        ix.sql("SELECT 1 FROM idx WHERE MATCH(text,'a','fuzz=2')")
    with pytest.raises(DslError, match="FROM idx"):
        ix.sql("SELECT 1 FROM elsewhere WHERE MATCH(text,'a')")
    # table= renames the index reference
    assert ix.sql("SELECT count(*) AS n FROM corpus "
                  "WHERE MATCH(text,'the')",
                  table="corpus").collect()[0]["n"] > 0


def test_sql_cli(built_index, capsys):
    from dart_importer_spark.cli import main

    assert main([
        "sql", "--index", built_index.dir, "--query",
        "SELECT role, count(*) AS n FROM idx WHERE MATCH(text, 'the') "
        "GROUP BY role ORDER BY role",
    ]) == 0
    rows = [json.loads(s) for s in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and {"role", "n"} <= set(rows[0])
