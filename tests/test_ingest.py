"""ES ingest pipelines compiled to Catalyst: processor semantics,
conditionals, ignore_missing, dissect patterns, simulate, failures."""

from __future__ import annotations

import pytest

from dart_importer_spark.ingest import (
    IngestError,
    _dissect_regex,
    compile_pipeline,
    simulate,
)


def test_pipeline_core_processors(spark):
    df = spark.createDataFrame(
        [(1, "  Hello World 42 ", "a,b,c")], "id long, msg string, csv string"
    )
    pipe = compile_pipeline({
        "processors": [
            {"trim": {"field": "msg"}},
            {"lowercase": {"field": "msg"}},
            {"gsub": {"field": "msg", "pattern": "\\d+", "replacement": "#"}},
            {"split": {"field": "csv", "separator": ",", "target_field": "parts"}},
            {"join": {"field": "parts", "separator": "|"}},
            {"set": {"field": "tag", "value": "t1"}},
            {"rename": {"field": "id", "target_field": "doc"}},
            {"convert": {"field": "doc", "type": "string"}},
            {"script": {"field": "n", "source": "length(msg)"}},
        ]
    })
    r = pipe(df).collect()[0]
    assert r["msg"] == "hello world #"
    assert r["parts"] == "a|b|c"
    assert r["tag"] == "t1"
    assert r["doc"] == "1" and isinstance(r["doc"], str)
    assert r["n"] == len("hello world #")
    assert "id" not in pipe(df).columns


def test_set_override_and_if(spark):
    df = spark.createDataFrame([(1, None), (2, "keep")], "id long, v string")
    pipe = compile_pipeline({
        "processors": [{"set": {"field": "v", "value": "x", "override": False}}]
    })
    got = {r["id"]: r["v"] for r in pipe(df).collect()}
    assert got == {1: "x", 2: "keep"}
    pipe2 = compile_pipeline({
        "processors": [{"lowercase": {"field": "v", "if": "id = 2"}}]
    })
    df2 = spark.createDataFrame([(1, "AA"), (2, "BB")], "id long, v string")
    got2 = {r["id"]: r["v"] for r in pipe2(df2).collect()}
    assert got2 == {1: "AA", 2: "bb"}


def test_ignore_missing_and_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    ok = compile_pipeline(
        {"processors": [{"lowercase": {"field": "nope", "ignore_missing": True}}]}
    )
    assert ok(df).collect()[0]["id"] == 1
    bad = compile_pipeline({"processors": [{"lowercase": {"field": "nope"}}]})
    with pytest.raises(IngestError):
        bad(df)
    with pytest.raises(IngestError):
        compile_pipeline({"processors": [{"bogus": {}}]})
    with pytest.raises(IngestError):
        compile_pipeline({"not_processors": []})
    with pytest.raises(IngestError):
        compile_pipeline({"processors": [{"rename": {"field": "a"}}]})


def test_dissect(spark):
    rx, fields = _dissect_regex("%{ts} [%{level}] %{msg}")
    assert fields == ["ts", "level", "msg"]
    df = spark.createDataFrame(
        [(1, "2024-01-01 [WARN] disk is full"),
         (2, "2024-01-02 [INFO] all good")],
        "id long, line string",
    )
    pipe = compile_pipeline(
        {"processors": [{"dissect": {"field": "line",
                                     "pattern": "%{ts} [%{level}] %{msg}"}}]}
    )
    got = {r["id"]: (r["ts"], r["level"], r["msg"]) for r in pipe(df).collect()}
    assert got[1] == ("2024-01-01", "WARN", "disk is full")
    assert got[2] == ("2024-01-02", "INFO", "all good")
    with pytest.raises(IngestError):
        _dissect_regex("no fields here")


def test_simulate_and_fail(spark):
    out = simulate(
        spark,
        {"processors": [{"uppercase": {"field": "w"}}]},
        [{"w": "abc"}, {"w": "xy"}],
    ).collect()
    assert sorted(r["w"] for r in out) == ["ABC", "XY"]
    failing = compile_pipeline(
        {"processors": [{"fail": {"if": "v < 0", "message": "neg"}}]}
    )
    df = spark.createDataFrame([(1,), (-2,)], "v long")
    with pytest.raises(Exception, match="neg"):
        failing(df).collect()
    # no offending row -> passes through
    df_ok = spark.createDataFrame([(1,), (2,)], "v long")
    assert failing(df_ok).count() == 2
    with pytest.raises(IngestError):
        compile_pipeline({"processors": [{"fail": {"message": "always"}}]})


def test_pipeline_plan_is_jvm(spark):
    from tests.test_plan_audit import _plan

    df = spark.createDataFrame([(1, "A b")], "id long, t string")
    pipe = compile_pipeline({
        "processors": [
            {"lowercase": {"field": "t"}},
            {"gsub": {"field": "t", "pattern": " ", "replacement": "_"}},
            {"script": {"field": "n", "source": "length(t)"}},
        ]
    })
    plan = _plan(pipe(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the whole chain folds into narrow projections: no shuffle
    assert "Exchange" not in plan
