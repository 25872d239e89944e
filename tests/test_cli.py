"""CLI round-trip — the Spark-native counterpart of the reference's argparse
main (reference import_dart_data.py:682-719)."""

from __future__ import annotations

import json

from dart_importer_spark.cli import main


def _lines(capsys) -> list[dict]:
    return [json.loads(s) for s in capsys.readouterr().out.strip().splitlines() if s]


def test_cli_build_query_count_delete(spark, transcripts_df, tmp_path, capsys):
    inp = str(tmp_path / "tx_parquet")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx")

    assert main(["build", "--input", inp, "--index", idx,
                 "--segments", "4", "--buckets", "8"]) == 0
    (m,) = _lines(capsys)
    assert m["built_segments"] == [0, 1, 2, 3]
    n_docs = m["n_docs"]

    assert main(["count", "--index", idx]) == 0
    (c,) = _lines(capsys)
    assert c["count"] == n_docs

    assert main(["query", "--index", idx, "--q", "삼성 전자", "--k", "3"]) == 0
    hits = _lines(capsys)
    assert len(hits) == 3
    assert hits[0]["score"] >= hits[-1]["score"]
    assert {"doc_id", "score", "conv_id", "turn_idx"} <= set(hits[0])

    assert main(["query", "--index", idx, "--q", "the", "--k", "2",
                 "--where", "role = 'assistant'"]) == 0
    for h in _lines(capsys):
        assert h["role"] == "assistant"

    assert main(["delete", "--index", idx, "--where", "role = 'tool'"]) == 0
    (d,) = _lines(capsys)
    assert d["deleted"] > 0
    assert main(["count", "--index", idx]) == 0
    (c2,) = _lines(capsys)
    assert c2["count"] == n_docs - d["deleted"]
