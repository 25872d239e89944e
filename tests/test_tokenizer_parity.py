"""Property-based tri-parity of the pinned analyzer: the Spark JVM regex,
the pandas/python regex, and the DuckDB regex must tokenize identically on
arbitrary unicode input (hypothesis-generated, batched through one
DataFrame per case set for speed)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dart_importer_spark.functions.tokenizer import (
    DUCKDB_TOKENIZE,
    shingle_list,
    tokenize_text,
)

# Known tri-parity exception: U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE)
# lowercases to TWO codepoints ("i" + U+0307) in Python and the JVM but to a
# single "i" in DuckDB's simple case fold. The ENGINE is self-consistent
# (Spark lower == Python lower — asserted below with İ included); only the
# DuckDB oracle leg diverges, so İ is excluded from the DuckDB property and
# documented here. It is the only default-locale lowercase expansion in
# Unicode's SpecialCasing.
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "S"), exclude_characters="İ"
    ),
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_python_duckdb_tokenize_parity(texts):
    con = duckdb.connect()
    expr = DUCKDB_TOKENIZE.format(col="t")
    for t in texts:
        (got,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()
        assert list(got) == tokenize_text(t), repr(t)


def test_spark_python_tokenize_parity(spark):
    # spark side once over a broad fixed corpus (JVM round-trip per
    # hypothesis example would be too slow; the JVM regex engine is the
    # third leg of the parity triangle)
    from pyspark.sql import functions as F

    from dart_importer_spark.functions.tokenizer import tokenize_col

    samples = [
        "", " ", "hello world", "UPPER lower MiXeD", "a1b2 c_3", "삼성 전자",
        "한글and영어mixed123", "一二三 四五", "tabs\tand\nnewlines",
        "punct,.;:!?()[]{}", "emoji 😀 test", "ㄱㄴㄷ ᆞ", "１２３ ｆｕｌｌ",
        "dash-joined under_scored", "  leading trailing  ", "中文字符测试",
        "İstanbul İ0",  # U+0130: engine-internal parity must still hold
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {r["t"]: r["toks"] for r in df.select("t", tokenize_col("t").alias("toks")).collect()}
    for s in samples:
        assert got[s] == tokenize_text(s), repr(s)


def test_shingle_list_edges():
    assert shingle_list([], 2) == []
    assert shingle_list(["a"], 2) == ["a"]
    assert shingle_list(["a", "b"], 3) == ["a\x1fb"]
    assert shingle_list(["a", "b", "c"], 2) == ["a\x1fb", "b\x1fc"]


def test_bpe_pretoken_count(spark):
    """BPE-ish pretokenizer: contractions, digit runs and punctuation runs
    split into separate pretokens (JVM regexp; count semantics)."""
    from dart_importer_spark.operators.text import with_bpe_pretoken_count

    rows = [
        (0, "don't stop"),        # don | 't | _stop -> 3
        (1, "abc123!!"),          # abc | 123 | !! -> 3
        (2, ""),                  # -> 0
        (3, "hello world"),       # hello | _world -> 2
        (4, "x  y"),              # x | _y? ' ?L+' eats one space; extra ws run
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_pretokens"] for r in with_bpe_pretoken_count(df).collect()}
    assert got[0] == 3
    assert got[1] == 3
    assert got[2] == 0
    assert got[3] == 2
    assert got[4] >= 3
