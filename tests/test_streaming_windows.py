"""Watermarked windowed aggregation (late event inside the watermark
counts; beyond-watermark event dropped) and applyInPandasWithState
sessionization (state carries last_ts + counter across micro-batches)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dart_importer_spark.streaming.windows import (
    streaming_sessionize,
    windowed_counts,
)

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("kind", StringType()),
])


def _write_batch(spark, landing: str, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)


def _run_available(stream_q, out_dir, ckpt, mode):
    q = (
        stream_q.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(landing)
        _run_available(
            windowed_counts(stream, "ts", window="1 hour",
                            watermark="1 hour", dims=("kind",)),
            out, ckpt, "append",
        )

    # batch 1: two events in the 10:00 window, one at 14:05 that pushes
    # the watermark to 13:05 — finalizing the 10:00 window
    _write_batch(spark, landing, [
        (1, 1, t0, "a"),
        (2, 1, t0 + dt.timedelta(minutes=20), "a"),
        (3, 1, dt.datetime(2024, 1, 1, 14, 5), "a"),
    ])
    run()
    # batch 2: an event at 10:40 — LATER than the 13:05 watermark, so the
    # already-finalized 10:00 window must NOT change; plus one at 16:30
    # advancing the watermark past 14:00 to flush that window
    _write_batch(spark, landing, [
        (4, 1, dt.datetime(2024, 1, 1, 10, 40), "a"),
        (5, 1, dt.datetime(2024, 1, 1, 16, 30), "a"),
    ])
    run()
    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    by_bucket = dict(zip(got["bucket"], got["n"]))
    assert by_bucket.get("2024-01-01 10:00:00") == 2  # late event dropped
    assert by_bucket.get("2024-01-01 14:00:00") == 1


def test_windowed_counts_late_within_watermark(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(landing)
        _run_available(
            windowed_counts(stream, "ts", window="1 hour",
                            watermark="3 hours"),
            out, ckpt, "append",
        )

    _write_batch(spark, landing, [
        (1, 1, dt.datetime(2024, 1, 1, 10, 0), "a"),
        (2, 1, dt.datetime(2024, 1, 1, 12, 0), "a"),
    ])
    run()
    # 10:40 is late but INSIDE the 3h watermark (wm = 09:00) -> it counts
    _write_batch(spark, landing, [
        (3, 1, dt.datetime(2024, 1, 1, 10, 40), "a"),
        (4, 1, dt.datetime(2024, 1, 1, 18, 0), "a"),  # flush via wm=15:00
    ])
    run()
    got = spark.read.parquet(out).toPandas()
    by_bucket = dict(zip(got["bucket"], got["n"]))
    assert by_bucket.get("2024-01-01 10:00:00") == 2  # late event counted
    assert by_bucket.get("2024-01-01 12:00:00") == 1


def test_streaming_sessionize_state_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(landing)
        # update mode needs an update-capable sink; land each micro-batch
        # into parquet via foreachBatch (the refresh path's pattern)
        q = (
            streaming_sessionize(stream, gap_s=1800)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1 two close events (one session), user 2 one event
    _write_batch(spark, landing, [
        (1, 1, t0, "a"),
        (2, 1, t0 + dt.timedelta(minutes=10), "a"),
        (10, 2, t0, "a"),
    ])
    run()
    # batch 2: user 1 events — one within the gap of batch 1's last event
    # (same session, state remembered) and one far later (new session)
    _write_batch(spark, landing, [
        (3, 1, t0 + dt.timedelta(minutes=35), "a"),
        (4, 1, t0 + dt.timedelta(hours=3), "a"),
    ])
    run()
    got = spark.read.parquet(out).toPandas()
    seq = dict(zip(got["event_id"], got["session_seq"]))
    assert seq[1] == 1 and seq[2] == 1
    assert seq[3] == 1  # 25 min after event 2: same session via state
    assert seq[4] == 2  # 3 h gap: new session
    assert seq[10] == 1  # independent key
