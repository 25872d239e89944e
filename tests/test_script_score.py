"""script_score: the Painless-expression subset compiled to Catalyst.

Identity and algebraic scripts must agree exactly with the engine's other
scored paths (topk, function_score); unsupported Painless raises rather
than diverging."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.query.painless import PainlessError, compile_script


def test_identity_script_equals_topk(built_index):
    got = built_index.script_score("the w00100", "_score", k=10, round_scores=6)
    want = built_index.topk("the w00100", k=10, round_scores=6)
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == [
        (r["doc_id"], r["score"]) for r in want.collect()
    ]


def test_affine_script(built_index):
    got = built_index.script_score(
        "the w00100", "2 * _score + params.b", params={"b": 1.0},
        k=10, round_scores=6,
    ).collect()
    want = built_index.topk("the w00100", k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(round(2 * w["score"] + 1.0, 6))


def test_doc_field_script_equals_function_score(built_index):
    got = built_index.script_score(
        "the w00100", "_score * Math.sqrt(doc['dl'].value)",
        k=10, round_scores=6,
    )
    want = built_index.function_score(
        "the w00100", k=10, factor_col="dl", modifier="sqrt",
        round_scores=6,
    )
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == [
        (r["doc_id"], r["score"]) for r in want.collect()
    ]


def test_min_score_and_dsl_body(built_index):
    from dart_importer_spark.query.dsl import search

    body = {
        "size": 10,
        "query": {
            "script_score": {
                "query": {"match": {"text": "the w00100"}},
                "script": {
                    "source": "saturation(_score, params.k)",
                    "params": {"k": 1.0},
                },
                "min_score": 0.3,
            }
        },
    }
    out = search(built_index, body, round_scores=6).collect()
    assert out, "expected hits"
    assert all(r["score"] >= 0.3 for r in out)
    # saturation maps into (0, 1)
    assert all(r["score"] < 1.0 for r in out)


def test_script_plan_is_jvm_only(built_index):
    df = built_index.script_score(
        "the w00100", "_score * Math.log1p(doc['dl'].value)", k=5
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan


def test_compile_script_ternary_and_sigmoid(spark):
    col, fields = compile_script(
        "doc['x'].value > 2 ? sigmoid(doc['x'].value, params.k, params.a) : 0",
        {"k": 2.0, "a": 1.0},
    )
    assert fields == {"x"}
    df = spark.createDataFrame([(1.0,), (4.0,)], "x double").select(
        F.round(col, 6).alias("v")
    )
    vals = [r["v"] for r in df.collect()]
    assert vals[0] == 0.0
    assert vals[1] == pytest.approx(round(4.0 / (2.0 + 4.0), 6))


def test_return_and_semicolon_stripped(spark):
    col, _ = compile_script("return Math.max(1, 2);")
    assert spark.range(1).select(col.alias("v")).collect()[0]["v"] == 2


def test_unsupported_painless_raises(built_index):
    with pytest.raises(PainlessError):
        compile_script("doc['x'].size()")
    with pytest.raises(PainlessError):
        compile_script("int i = 0; i + 1")
    with pytest.raises(PainlessError, match="missing param"):
        compile_script("params.nope")
    with pytest.raises(PainlessError, match="unsupported Math"):
        compile_script("Math.tanh(1)")
    with pytest.raises(ValueError, match="unknown doc field"):
        built_index.script_score("the", "doc['nope'].value", k=5).collect()
