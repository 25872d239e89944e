"""Structured-Streaming incremental refresh: exactly-once landing-file
consumption + fingerprint-guarded segment rebuilds, equal to a batch rebuild."""

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
    ix1 = InvertedIndex(spark, idx)
    n1 = ix1.n_docs
    assert n1 == first.count()

    # drain again with nothing new: checkpoint prevents re-consumption
    m_idle = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    assert all(not m["built_segments"] for m in m_idle)

    # key-monotone append of new conversations
    second.coalesce(1).write.mode("append").parquet(landing)
    m2 = incremental_refresh(spark, landing, idx, TRANSCRIPTS_SCHEMA, CFG)
    built = sorted({s for m in m2 for s in m["built_segments"]})
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
    assert built == touched

    ix2 = InvertedIndex(spark, idx)
    assert ix2.n_docs == all_tr.count()

    # rank-identity vs a from-scratch batch build over the same 120 convs
    batch_dir = str(tmp_path / "batch_idx")
    build_index(spark, all_tr, batch_dir, CFG)
    bx = InvertedIndex(spark, batch_dir)
    assert abs(ix2.avgdl - bx.avgdl) < 1e-9
    for q in ["the and of", "삼성 전자", "w00042 w00123"]:
        assert _topk(ix2, q) == _topk(bx, q), q
    all_tr.unpersist()
