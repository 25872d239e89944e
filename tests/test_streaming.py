"""Structured-Streaming incremental refresh: exactly-once landing-file
consumption, O(batch) appends under the (enforced) key-monotone contract,
full-rebuild fallback on contract violation, equal to a batch rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from dart_importer_spark.datagen import TRANSCRIPTS_SCHEMA, generate_transcripts
from dart_importer_spark.index.build import BuildConfig, build_index
from dart_importer_spark.query.engine import InvertedIndex
from dart_importer_spark.streaming.refresh import incremental_refresh

CFG = BuildConfig(n_segments=4, n_buckets=8)


def _topk(ix, q, k=20):
    return [(r["doc_id"], round(r["score"], 9)) for r in ix.topk(q, k=k).collect()]


def test_incremental_refresh_matches_batch_rebuild(spark, tmp_path):
    landing = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")

    all_tr = generate_transcripts(spark, 120).persist()
    first = all_tr.filter(F.col("conv_id") < "conv00000080")
    second = all_tr.filter(F.col("conv_id") >= "conv00000080")

    first.coalesce(1).write.mode("append").parquet(landing)
    m1 = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    assert len(m1) == 1
    assert m1[0]["mode"] == "initial_build"
    ix1 = InvertedIndex(spark, idx)
    n1 = ix1.n_docs
    assert n1 == first.count()

    # drain again with nothing new: checkpoint prevents re-consumption
    m_idle = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    assert m_idle == []

    # key-monotone append of new conversations: O(batch), not O(corpus) —
    # the metrics report exactly the batch's rows as the work done
    second.coalesce(1).write.mode("append").parquet(landing)
    m2 = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    assert [m["mode"] for m in m2] == ["append"]
    assert m2[0]["appended_docs"] == second.count()
    touched = sorted(
        r["seg"]
        for r in second.select(
            F.pmod(F.crc32(F.encode("conv_id", "utf-8")), F.lit(CFG.n_segments))
            .cast("int")
            .alias("seg")
        )
        .distinct()
        .collect()
    )
    assert m2[0]["segments_touched"] == touched

    ix2 = InvertedIndex(spark, idx)
    assert ix2.n_docs == all_tr.count()

    # rank-identity vs a from-scratch batch build over the same 120 convs
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, all_tr, batch_dir, CFG)
    bx = InvertedIndex(spark, batch_dir)
    assert abs(ix2.avgdl - bx.avgdl) < 1e-9
    for q in ["the and of", "삼성 전자", "w00042 w00123"]:
        assert _topk(ix2, q) == _topk(bx, q), q

    # a later full build over the identical corpus must skip every segment
    # (append XOR-combined the manifest fingerprints correctly)
    m3 = build_index(spark, all_tr, idx, CFG)
    assert m3["built_segments"] == []
    assert sorted(m3["skipped_segments"]) == list(range(CFG.n_segments))
    all_tr.unpersist()


def test_monotone_violation_falls_back_to_rebuild(spark, tmp_path):
    """ADVICE r01: an out-of-order landing file must NOT corrupt doc_ids —
    the refresh detects the violated append contract and rebuilds."""
    landing = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")

    all_tr = generate_transcripts(spark, 60).persist()
    late = all_tr.filter(F.col("conv_id") < "conv00000010")  # sorts FIRST
    rest = all_tr.filter(F.col("conv_id") >= "conv00000010")

    rest.coalesce(1).write.mode("append").parquet(landing)
    incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)

    late.coalesce(1).write.mode("append").parquet(landing)
    m = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    assert [x["mode"] for x in m] == ["monotone_violation_rebuild"]

    ix = InvertedIndex(spark, idx)
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, all_tr, batch_dir, CFG)
    bx = InvertedIndex(spark, batch_dir)
    assert ix.n_docs == bx.n_docs
    for q in ["the and of", "삼성 전자"]:
        assert _topk(ix, q) == _topk(bx, q), q
    all_tr.unpersist()


def test_append_index_rejects_overlapping_keys(spark, tmp_path):
    import pytest

    from dart_importer_spark.index.build import append_index

    idx = str(tmp_path / "idx")
    tr = generate_transcripts(spark, 30)
    build_index(spark, tr, idx, CFG)
    with pytest.raises(ValueError, match="monotone"):
        append_index(spark, tr.limit(5), idx, batch_tag="dup")


def test_streaming_refresh_with_positions_and_shingles(spark, tmp_path):
    """The O(batch) append path must compose with positional postings and
    shingle subfields: after two streamed batches, match_phrase and
    search_as_you_type answer identically to a from-scratch build."""
    import numpy as np

    landing = str(tmp_path / "landing_pos")
    idx = str(tmp_path / "idx_pos")
    cfg = BuildConfig(n_segments=2, n_buckets=4, store_positions=True)
    kw = dict(shingle_fields=(("text", 2),))

    all_tr = generate_transcripts(spark, 80).persist()
    first = all_tr.filter(F.col("conv_id") < "conv00000050")
    second = all_tr.filter(F.col("conv_id") >= "conv00000050")

    first.coalesce(1).write.mode("append").parquet(landing)
    m1 = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, cfg, **kw)
    assert m1[0]["mode"] == "initial_build"
    second.coalesce(1).write.mode("append").parquet(landing)
    m2 = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, cfg, **kw)
    assert m2[0]["mode"] == "append"

    full = str(tmp_path / "idx_full")
    build_index(spark, all_tr, full, cfg, **kw)
    a, b = InvertedIndex(spark, idx), InvertedIndex(spark, full)
    pa = a.match_phrase("the and", k=100).toPandas()
    pb = b.match_phrase("the and", k=100).toPandas()
    assert list(pa["doc_id"]) == list(pb["doc_id"])
    sa = a.search_as_you_type("the an", k=10).toPandas()
    sb = b.search_as_you_type("the an", k=10).toPandas()
    assert list(sa["doc_id"]) == list(sb["doc_id"])
    assert np.allclose(sa["score"], sb["score"], atol=1e-9)
    all_tr.unpersist()
