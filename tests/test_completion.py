"""ES completion suggester (index/completion.py): prefix lookup pruned
to the first-char partition, weight-ordered top-k, category contexts,
fuzzy prefixes (Damerau on the same-length stored prefix), duplicate
skipping. ES's third suggester — term and phrase live in query/engine.py.
Reference type-ahead analogue: the search_as_you_type corp-name
subfields (import_dart_data.py:353-354,395-405)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.index.completion import (
    CompletionIndex,
    build_completion,
)

ROWS = [
    # (input, weight, doc_id, lang)
    ("keyboard", 90, 0, "en"),
    ("Keyboard", 70, 1, "ko"),      # case-folds onto the same prefix
    ("keyring", 50, 2, "en"),
    ("kernel panic", 99, 3, "en"),
    ("kyeboard", 40, 4, "en"),      # transposed: fuzzy hit for "key"
    ("mouse", 80, 5, "en"),
    ("", 10, 6, "en"),              # empty input dropped at build
    (None, 10, 7, "en"),            # null input dropped at build
    ("keyboard", 60, 8, "en"),      # duplicate text, lower weight
]


@pytest.fixture(scope="module")
def cx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        ROWS, "input string, weight long, doc_id long, lang string"
    )
    out = str(tmp_path_factory.mktemp("completion") / "cx")
    metrics = build_completion(spark, df, out, context_cols=("lang",))
    assert metrics["n_entries"] == 7  # empty + null dropped
    return CompletionIndex(spark, out)


def _got(df):
    return [(r["input"], r["weight"], r["doc_id"]) for r in df.collect()]


def test_prefix_weight_order(cx):
    assert _got(cx.suggest("ke", k=10)) == [
        ("kernel panic", 99, 3),
        ("keyboard", 90, 0),
        ("Keyboard", 70, 1),   # folded match, original text returned
        ("keyboard", 60, 8),
        ("keyring", 50, 2),
    ]
    assert _got(cx.suggest("keyb", k=10)) == [
        ("keyboard", 90, 0),
        ("Keyboard", 70, 1),
        ("keyboard", 60, 8),
    ]
    assert _got(cx.suggest("zz", k=10)) == []


def test_skip_duplicates(cx):
    # one entry per suggestion TEXT (case-sensitive, like ES), highest
    # weight survives
    assert _got(cx.suggest("key", k=10, skip_duplicates=True)) == [
        ("keyboard", 90, 0),
        ("Keyboard", 70, 1),
        ("keyring", 50, 2),
    ]


def test_contexts(cx):
    assert _got(cx.suggest("ke", k=10, contexts={"lang": ["ko"]})) == [
        ("Keyboard", 70, 1)
    ]
    with pytest.raises(ValueError, match="not a context column"):
        cx.suggest("ke", contexts={"nope": ["x"]})


def test_fuzzy(cx):
    # "kye" at fuzziness 1: exact prefix misses everything; the Damerau
    # transpose reaches the key* family AND kyeboard itself
    exact = _got(cx.suggest("kye", k=10))
    assert exact == [("kyeboard", 40, 4)]
    fuzzy = _got(cx.suggest("kye", k=10, fuzziness=1))
    assert fuzzy == [
        ("keyboard", 90, 0),
        ("Keyboard", 70, 1),
        ("keyboard", 60, 8),
        ("keyring", 50, 2),
        ("kyeboard", 40, 4),
    ]
    # AUTO bands: len 3 -> 1 edit, same result
    assert _got(cx.suggest("kye", k=10, fuzziness="AUTO")) == fuzzy
    # min_length gates fuzz off for short prefixes
    assert _got(cx.suggest("kye", k=10, fuzziness=1, min_length=4)) == exact
    # prefix_length keeps the first N chars exact: "mye" can't reach
    # mouse-family or key-family with the first char pinned to 'm'
    assert _got(cx.suggest("mye", k=10, fuzziness=1)) == []
    with pytest.raises(ValueError, match="AUTO"):
        cx.suggest("kye", fuzziness="banana")


def test_validation(cx, spark):
    with pytest.raises(ValueError, match="non-empty"):
        cx.suggest("")
    with pytest.raises(ValueError, match="missing column"):
        build_completion(
            spark,
            spark.createDataFrame([("a",)], "input string"),
            "/tmp/never_written_completion",
        )


def test_prefix_query_is_partition_pruned(cx):
    # the first-char p1 partition filter must reach the scan: ES's FST
    # prefix walk, as storage pruning
    df = cx.suggest("ke", k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "p1" in plan
    assert "PartitionFilters: []" not in plan
    assert "BatchEvalPython" not in plan  # pure-Catalyst suggest path


def test_rebuild_replaces_all_partitions(spark, tmp_path):
    # build_index sets the session to dynamic partition overwrite; a
    # completion rebuild must still replace the WHOLE table — stale p1
    # partitions from the previous build would resurrect dead suggestions
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = str(tmp_path / "rebuild")
        one = spark.createDataFrame(
            [("apple", 1, 0), ("cherry", 2, 1)],
            "input string, weight long, doc_id long",
        )
        build_completion(spark, one, out)
        two = spark.createDataFrame(
            [("cherry", 3, 2)], "input string, weight long, doc_id long"
        )
        build_completion(spark, two, out)
        cx2 = CompletionIndex(spark, out)
        assert cx2.suggest("a", k=5).collect() == []
        assert _got(cx2.suggest("c", k=5)) == [("cherry", 3, 2)]
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_format_version_guard(cx, spark, tmp_path):
    import json
    import os
    import shutil

    bad = str(tmp_path / "bad")
    shutil.copytree(cx.dir, bad)
    with open(os.path.join(bad, "meta.json"), "w") as f:
        json.dump({"format_version": 999, "context_cols": []}, f)
    with pytest.raises(ValueError, match="format_version"):
        CompletionIndex(spark, bad)
