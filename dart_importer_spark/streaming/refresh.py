"""Incremental index refresh via Structured Streaming.

The reference is strictly batch (CLI main at reference
import_dart_data.py:682-719); its only "incremental" behavior is the
skip-if-present resume loop (:543-550). This module is the Spark-native
generalization: a file-source stream over a landing directory of transcript
parquet files, consumed exactly-once (checkpointed offsets), with each
micro-batch appended to the index's corpus table and only the segments whose
input fingerprint changed rebuilt (the manifest anti-join of
``index.build.build_index``).

Append contract (documented, asserted in tests): new conv_ids must sort
after all existing ones (time-ordered ingestion — natural for transcript
streams with timestamp-prefixed conversation ids). Under that contract the
stable (conv_id, turn_idx) rank of every existing document is unchanged, so
already-committed segments stay valid byte-for-byte; block-max metadata is
avgdl-independent by construction, and query-time scoring always reads the
republished global N / avgdl / df, so scores stay exact after every refresh.

Exactly-once: the stream checkpoint guarantees each landing file is consumed
once; the micro-batch is staged to ``corpus/batch=<id>`` with overwrite, so
a replayed batch rewrites the same partition (idempotent), and the segment
rebuild is itself fingerprint-guarded.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..index.build import BuildConfig, build_index


def corpus_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "corpus")


def read_corpus(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(corpus_dir(index_dir))


def incremental_refresh(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    schema: T.StructType,
    config: BuildConfig | None = None,
    checkpoint_dir: str | None = None,
    on_batch: Callable[[int, dict], None] | None = None,
    **build_kwargs,
) -> list[dict]:
    """Drain all currently-available landing files into the index.

    Runs with Trigger.AvailableNow (drain-and-stop — call again on a
    schedule or keep a long-lived query by swapping the trigger). Returns
    the per-batch build metrics.
    """
    cfg = config or BuildConfig()
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(index_dir, "_stream_checkpoint")
    metrics: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        staged = os.path.join(corpus_dir(index_dir), f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(staged)
        full = read_corpus(spark, index_dir)
        m = build_index(spark, full, index_dir, cfg, **build_kwargs)
        m["batch_id"] = batch_id
        metrics.append(m)
        if on_batch is not None:
            on_batch(batch_id, m)

    stream = spark.readStream.schema(schema).parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics
