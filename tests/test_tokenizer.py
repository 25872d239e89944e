"""Tokenizer pin: the three implementations (Spark JVM regexp, pandas/python,
DuckDB) must agree exactly — every downstream number depends on this."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dart_importer_spark.functions.tokenizer import (
    DUCKDB_TOKENIZE,
    tokenize_col,
    tokenize_series,
    tokenize_text,
)

CASES = [
    "Hello, World! 123",
    "the-quick_brown fox",
    "삼성전자 재무제표 2024",
    "mixed 삼성 English 전자",
    "",
    "   ",
    "UPPER lower MiXeD",
    "a_b_c x1y2",
    "punct!!!only???",
    "한글과English섞임",
]


def test_python_golden():
    assert tokenize_text("Hello, World! 123") == ["hello", "world", "123"]
    assert tokenize_text("삼성전자 재무제표") == ["삼성전자", "재무제표"]
    assert tokenize_text("한글과English섞임") == ["한글과", "english", "섞임"]
    assert tokenize_text("") == []
    assert tokenize_text(None) == []


def test_pandas_matches_python():
    s = pd.Series(CASES)
    out = tokenize_series(s)
    for text, toks in zip(CASES, out):
        assert toks == tokenize_text(text)


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    rows = df.select(tokenize_col("text").alias("toks")).collect()
    for text, row in zip(CASES, rows):
        assert row["toks"] == tokenize_text(text), text


def test_duckdb_matches_python():
    con = duckdb.connect()
    expr = DUCKDB_TOKENIZE.format(col="t")
    for text in CASES:
        got = con.execute(f"select {expr} from (select ? as t)", [text]).fetchone()[0]
        assert list(got) == tokenize_text(text), text
