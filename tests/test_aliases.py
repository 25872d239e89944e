"""ES index aliases + rollover: the name-indirection layer over the
reference's one-index-per-data-type layout (import_dart_data.py:685-688).
Registry semantics (atomic actions, write-index resolution) are pure file
ops; filtered-alias search must equal the explicit filtered body; a
two-member alias must merge like the multi-index coordinating-node step;
rollover must repoint the write flag in ONE registry write."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.index.aliases import (
    AliasError,
    AliasRegistry,
    count_alias,
    rollover,
    search_alias,
)
from dart_importer_spark.query.engine import InvertedIndex


def test_registry_actions(tmp_path):
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    reg.put("logs", "/idx/a")
    reg.put("logs", "/idx/b", filter={"term": {"role": "user"}})
    got = reg.resolve("logs")
    assert [r["index"] for r in got] == ["/idx/a", "/idx/b"]
    assert got[1]["filter"] == {"term": {"role": "user"}}
    # sole member = implicit write index; two members without a flag = error
    reg.put("one", "/idx/a")
    assert reg.write_index("one") == "/idx/a"
    with pytest.raises(AliasError, match="write index"):
        reg.write_index("logs")
    # promoting one demotes the others, atomically in one actions call
    reg.update([
        {"add": {"alias": "logs", "index": "/idx/a", "is_write_index": True}},
        {"add": {"alias": "logs", "index": "/idx/c", "is_write_index": True}},
    ])
    assert reg.write_index("logs") == "/idx/c"
    flags = [r["is_write_index"] for r in reg.resolve("logs")]
    assert flags.count(True) == 1
    # remove one member, then the whole alias
    reg.remove("logs", "/idx/c")
    assert {r["index"] for r in reg.resolve("logs")} == {"/idx/a", "/idx/b"}
    reg.remove("logs")
    with pytest.raises(AliasError, match="unknown alias"):
        reg.resolve("logs")
    with pytest.raises(AliasError, match="unknown action"):
        reg.update([{"rename": {}}])


def test_filtered_alias_search_and_count(spark, built_index, tmp_path):
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    reg.put("tx-user", built_index.dir,
            filter={"term": {"role": "user"}})
    body = {"query": {"match": {"text": "the and"}}, "size": 12}
    got = search_alias(spark, reg, "tx-user", body, round_scores=6)
    want = built_index.search({
        "query": {"bool": {
            "must": [{"match": {"text": "the and"}}],
            "filter": [{"term": {"role": "user"}}],
        }},
        "size": 12,
    }, round_scores=6)
    assert [tuple(r) for r in got.select("doc_id", "score").collect()] \
        == [tuple(r) for r in want.select("doc_id", "score").collect()]
    assert set(got.columns) == {"index", "doc_id", "score"}
    # count: the alias filter applies to _count too
    n = count_alias(spark, reg, "tx-user", {"query": {"match_all": {}}})
    assert n == built_index.count(F.col("role") == "user")


@pytest.fixture(scope="module")
def split_indexes(spark, transcripts_df, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index

    base = tmp_path_factory.mktemp("alias_idx")
    halves = {}
    for name, pred in (
        ("tx-000001", F.col("conv_id") < "conv00000100"),
        ("tx-000002", F.col("conv_id") >= "conv00000100"),
    ):
        out = str(base / name)
        build_index(spark, transcripts_df.filter(pred), out,
                    BuildConfig(n_segments=2, n_buckets=4))
        halves[name] = InvertedIndex(spark, out)
    return halves


def test_multi_member_alias_merges_by_score(spark, split_indexes, tmp_path):
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    for name, ix in split_indexes.items():
        reg.put("tx-all", ix.dir)
    body = {"query": {"match": {"text": "the and"}}, "size": 15}
    got = search_alias(spark, reg, "tx-all", body, round_scores=6).collect()
    # manual coordinating-node merge: per-index top-k, union, re-rank
    rows = []
    for name, ix in split_indexes.items():
        for r in ix.search(body, round_scores=6).collect():
            rows.append((r["score"], name, r["doc_id"]))
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(n, d, s) for s, n, d in rows[:15]]
    assert [(r["index"], r["doc_id"], r["score"]) for r in got] == want
    # a deep enough merge surfaces hits from BOTH members
    wide = search_alias(spark, reg, "tx-all",
                        {**body, "size": 500}).collect()
    assert {r["index"] for r in wide} == set(split_indexes)
    # count over the alias = sum of member counts
    assert count_alias(spark, reg, "tx-all") == sum(
        ix.count() for ix in split_indexes.values()
    )


def test_rollover(spark, split_indexes, tmp_path):
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    (name1, ix1), (name2, _ix2) = sorted(split_indexes.items())
    reg.put("tx-write", ix1.dir, is_write_index=True)

    new_dir = str(tmp_path / "tx-000003")
    # condition not met: nothing moves
    out = rollover(spark, reg, "tx-write", new_dir, max_docs=10**9)
    assert out["rolled_over"] is False and out["conditions"]
    assert reg.write_index("tx-write") == ix1.dir
    # dry_run: condition met but nothing moves
    out = rollover(spark, reg, "tx-write", new_dir, max_docs=1, dry_run=True)
    assert out["rolled_over"] is False and out["dry_run"] is True
    assert reg.write_index("tx-write") == ix1.dir
    # met: ONE atomic registry write repoints the write flag; the old
    # index stays a read member
    out = rollover(spark, reg, "tx-write", new_dir, max_docs=1)
    assert out["rolled_over"] is True
    assert reg.write_index("tx-write") == out["new_index"]
    members = [r["index"] for r in reg.resolve("tx-write")]
    assert ix1.dir in members and out["new_index"] in members
    # a second rollover before the new write index is built reports
    # conditions-unmet (it has no docs yet) instead of crashing
    again = rollover(spark, reg, "tx-write", str(tmp_path / "tx-000004"),
                     max_docs=1)
    assert again["rolled_over"] is False and "note" in again
    assert reg.write_index("tx-write") == out["new_index"]


def test_rollover_refuses_existing_target(spark, split_indexes, tmp_path):
    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    (name1, ix1), (name2, ix2) = sorted(split_indexes.items())
    reg.put("tx-w", ix1.dir, is_write_index=True)
    with pytest.raises(AliasError, match="already exists"):
        rollover(spark, reg, "tx-w", ix2.dir, max_docs=1)


def test_cli_alias_roundtrip(spark, split_indexes, tmp_path, capsys):
    from dart_importer_spark.cli import main

    regp = str(tmp_path / "aliases.json")
    (name1, ix1), (name2, ix2) = sorted(split_indexes.items())
    assert main(["alias", "--registry", regp, "--add", "tx-all", ix1.dir]) == 0
    capsys.readouterr()
    assert main(["alias", "--registry", regp, "--add", "tx-all", ix2.dir,
                 "--filter", json.dumps({"term": {"role": "user"}})]) == 0
    capsys.readouterr()
    assert main(["alias", "--registry", regp, "--list"]) == 0
    listing = json.loads(capsys.readouterr().out)
    assert len(listing["tx-all"]) == 2
    body = json.dumps({"query": {"match": {"text": "the"}}, "size": 5})
    assert main(["alias-search", "--registry", regp, "--alias", "tx-all",
                 "--body", body]) == 0
    hits = [json.loads(s) for s in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(hits) <= 5
    assert {"index", "doc_id", "score"} <= set(hits[0])
    assert main(["alias-search", "--registry", regp, "--alias", "tx-all",
                 "--body", body, "--count"]) == 0
    c = json.loads(capsys.readouterr().out)
    assert c["count"] > 0
    assert main(["alias", "--registry", regp, "--add", "tx-w", ix1.dir,
                 "--write"]) == 0
    capsys.readouterr()
    assert main(["rollover", "--registry", regp, "--alias", "tx-w",
                 "--new-index", str(tmp_path / "tx-next"),
                 "--max-docs", "1000000000"]) == 0
    ro = json.loads(capsys.readouterr().out)
    assert ro["rolled_over"] is False
