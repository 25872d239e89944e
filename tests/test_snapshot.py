"""ES _snapshot/_restore: incremental file-level backups. The contract
under test: a restore is the index AS OF the snapshot (a delete issued
after snapshotting does not leak in), a second snapshot after an append
stores only the NEW files (segment immutability makes reuse sound), and
deleting a snapshot drops exactly the blobs no other snapshot shares."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.datagen import generate_transcripts
from dart_importer_spark.index.build import BuildConfig, append_index, build_index
from dart_importer_spark.index.snapshot import SnapshotError, SnapshotRepo
from dart_importer_spark.query.engine import InvertedIndex

CFG = BuildConfig(n_segments=2, n_buckets=4)


@pytest.fixture(scope="module")
def snap_env(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("snap")
    tx = generate_transcripts(spark, 30).persist()
    first = tx.filter(F.col("conv_id") < "conv00000020")
    second = tx.filter(F.col("conv_id") >= "conv00000020")
    idx = str(base / "idx")
    build_index(spark, first, idx, CFG, meta_cols=("role",))
    yield base, idx, first, second
    tx.unpersist()


def test_snapshot_restore_roundtrip_and_pinning(spark, snap_env):
    base, idx, first, second = snap_env
    repo = SnapshotRepo(str(base / "repo"))
    ix = InvertedIndex(spark, idx)
    n0 = ix.count()
    top0 = [tuple(r) for r in ix.topk("the and", k=10).collect()]

    m = repo.create("s1", idx)
    assert m["total"] > 0 and m["incremental"] == m["total"]

    # mutate AFTER the snapshot: restore must show the pinned state
    assert ix.delete_by_query(F.col("role") == "tool") > 0
    assert ix.count() < n0

    out = str(base / "restored")
    r = repo.restore("s1", out)
    assert r["restored"] == m["total"]
    ix2 = InvertedIndex(spark, out)
    assert ix2.count() == n0
    assert [tuple(r) for r in ix2.topk("the and", k=10).collect()] == top0


def test_snapshot_incremental_reuse_and_gc(spark, snap_env):
    base, idx, first, second = snap_env
    repo = SnapshotRepo(str(base / "repo2"))
    m1 = repo.create("epoch1", idx)

    # append new docs: the next snapshot must reuse the untouched files
    append_index(spark, second, idx, batch_tag="snap-inc")
    m2 = repo.create("epoch2", idx)
    assert m2["reused"] > 0, "unchanged segment files must not re-copy"
    assert m2["incremental"] > 0, "appended files must be stored"
    assert m2["total"] == m2["reused"] + m2["incremental"]

    names = [s["snapshot"] for s in repo.list()]
    assert names == ["epoch1", "epoch2"]

    # dropping epoch1 GCs only blobs epoch2 doesn't reference
    blobs_before = len(os.listdir(os.path.join(repo.path, "blobs")))
    d = repo.delete("epoch1")
    blobs_after = len(os.listdir(os.path.join(repo.path, "blobs")))
    assert blobs_before - blobs_after == d["blobs_dropped"]
    # epoch2 must still restore completely after the GC
    out = str(base / "restored2")
    repo.restore("epoch2", out)
    assert InvertedIndex(spark, out).count() == \
        InvertedIndex(spark, idx).count()


def test_snapshot_refusals(spark, snap_env):
    base, idx, *_ = snap_env
    repo = SnapshotRepo(str(base / "repo3"))
    repo.create("dup", idx)
    with pytest.raises(SnapshotError, match="already exists"):
        repo.create("dup", idx)
    with pytest.raises(SnapshotError, match="not found"):
        repo.restore("nope", str(base / "never"))
    with pytest.raises(SnapshotError, match="not a built index"):
        repo.create("bad", str(base))
    occupied = str(base / "occupied")
    os.makedirs(occupied)
    open(os.path.join(occupied, "x"), "w").close()
    with pytest.raises(SnapshotError, match="not empty"):
        repo.restore("dup", occupied)
    with pytest.raises(SnapshotError, match="bad name"):
        repo.create("../evil", idx)


def test_snapshot_cli_roundtrip(spark, snap_env, capsys):
    from dart_importer_spark.cli import main

    base, idx, *_ = snap_env
    repo = str(base / "repo_cli")
    assert main(["snapshot", "--repo", repo, "--create", "c1",
                 "--index", idx]) == 0
    created = json.loads(capsys.readouterr().out.strip())
    assert created["total"] > 0
    assert main(["snapshot", "--repo", repo, "--list"]) == 0
    listed = json.loads(capsys.readouterr().out.strip())
    assert [s["snapshot"] for s in listed] == ["c1"]
    out = str(base / "cli_restored")
    assert main(["restore", "--repo", repo, "--name", "c1",
                 "--out", out]) == 0
    capsys.readouterr()
    assert InvertedIndex(spark, out).count() > 0
