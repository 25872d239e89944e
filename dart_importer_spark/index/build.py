"""Inverted-index build: transcripts DataFrame -> segmented index tables.

The reference's entire index build happens inside Elasticsearch/Lucene (bulk
load at reference import_dart_data.py:495-499,595-599; analyzed ``text``
mappings at :346-364,383-443). This module is the from-scratch Spark-native
replacement. Layout on disk (parquet; Iceberg-compatible table shapes):

    <out>/postings/      seg=<s>/bucket=<b>/...  one row per (term, run):
                         delta+varbyte doc_ids, varbyte tfs + dls, per-block
                         (first_doc, max_tf, min_dl) metadata for block-max
                         pruning
    <out>/doc_stats/     seg=<s>/   (doc_id, conv_id, turn_idx, role, tool,
                         ts, dl) — metadata filters + length norms
    <out>/term_seg_df/   seg=<s>/   per-segment partial document frequencies
    <out>/term_dict/     (term, df) — global, published from partials
    <out>/corpus_stats/  single row (n_docs, avgdl, total_tokens)
    <out>/manifests/     per-segment lineage (FIXTURES.md T3) — the working
                         version of the reference's dead lineage code
                         (import_dart_data.py:606-625 builds a history dict
                         that is never indexed; here manifests are real and
                         drive checkpoint-resume)

Scale design (the 10^12-turn design point):
- doc_id assignment is the classic two-pass zipWithIndex: range-partition by
  (conv_id, turn_idx), count per partition (tiny driver collect), then a
  vectorized mapInPandas adds offset + local row number. No global window,
  no single-partition bottleneck. The rank is independent of partition
  boundaries, so it is deterministic and resume-safe.
- the one big shuffle is groupBy(term, doc_id) -> tf, then the grouped-map
  encode keyed on (seg, term, run). Stopword skew is handled *explicitly*:
  terms whose per-segment df exceeds ``target_run`` are split into
  range-disjoint runs (run = doc_id * nruns / N), capping every grouped-map
  group at ~target_run postings — on top of AQE skew splitting.
- segments (seg = crc32(conv_id) % n_segments) are the resume granularity:
  a failed/partial build re-runs only segments whose manifest row is missing
  or whose input fingerprint changed. Writes use dynamic partition overwrite
  so a re-build replaces exactly its own partitions.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import delta_encode, varbyte_encode
from ..functions.tokenizer import tokenize_col

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128


@dataclass
class BuildConfig:
    n_segments: int = 8
    n_buckets: int = 16
    target_run: int = 1 << 17  # max postings per encoded run (skew cap)
    doc_id_partitions: int | None = None


POSTINGS_SCHEMA = (
    "seg int, term string, run int, n long, min_doc long, max_doc long, "
    "docs binary, tfs binary, dls binary, "
    "block_first array<long>, block_max_tf array<int>, block_min_dl array<int>"
)


def assign_doc_ids(
    df: DataFrame,
    partitions: int | None = None,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    persisted: list | None = None,
) -> DataFrame:
    """Stable dense doc_id = global rank under ORDER BY key_cols.

    Two-pass distributed ranking (no global window):
      1. range-partition + sort within partitions, persist;
      2. per-partition counts -> prefix-sum offsets (driver, tiny);
      3. mapInPandas adds offset + running local index (Arrow-vectorized).

    ``persisted`` collects the internal cached DataFrame so the caller can
    unpersist it — leaking it is not just memory: Spark's CacheManager
    matches by canonicalized plan, so a later build over the SAME source
    path would silently reuse the stale cached rows.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)
    ranged = (
        df.repartitionByRange(partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged.persist()
    if persisted is not None:
        persisted.append(ranged)
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = df.schema.add("doc_id", "long", False)

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if not len(pdf):
                continue
            start = bc.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(local, local + len(pdf), dtype=np.int64) + start
            local += len(pdf)
            yield pdf

    return ranged.mapInPandas(number, schema=out_schema)


def pack_run(docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> dict:
    """Encode one sorted posting run into the on-disk field dict.

    Block bound validity: tfn(tf, dl) = tf / (tf + k1*(1-b+b*dl/avgdl)) is
    increasing in tf and decreasing in dl, so tfn(max_tf, min_dl) is a
    conservative per-block upper bound for any avgdl — which lets us store
    avgdl-independent metadata and keep segments immutable across merges.
    """
    n = len(docs)
    nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    pad = nb * BLOCK_SIZE - n
    tf_pad = np.pad(tfs, (0, pad), constant_values=0)
    dl_pad = np.pad(dls, (0, pad), constant_values=np.iinfo(np.int64).max)
    block_max_tf = tf_pad.reshape(nb, BLOCK_SIZE).max(axis=1).astype(np.int32)
    block_min_dl = np.minimum(
        dl_pad.reshape(nb, BLOCK_SIZE).min(axis=1), np.int64(2**31 - 1)
    ).astype(np.int32)
    return {
        "n": n,
        "min_doc": int(docs[0]),
        "max_doc": int(docs[-1]),
        "docs": delta_encode(docs),
        "tfs": varbyte_encode(tfs),
        "dls": varbyte_encode(dls),
        "block_first": docs[::BLOCK_SIZE].tolist(),
        "block_max_tf": block_max_tf.tolist(),
        "block_min_dl": block_min_dl.tolist(),
    }


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map encoder for one (seg, term, run) group: sort by doc_id,
    delta+varbyte pack, emit per-block max_tf / min_dl for block-max bounds."""
    pdf = pdf.sort_values("doc_id")
    fields = pack_run(
        pdf["doc_id"].to_numpy(dtype=np.int64),
        pdf["tf"].to_numpy(dtype=np.int64),
        pdf["dl"].to_numpy(dtype=np.int64),
    )
    return pd.DataFrame(
        {
            "seg": [int(pdf["seg"].iloc[0])],
            "term": [pdf["term"].iloc[0]],
            "run": [int(pdf["run"].iloc[0])],
            **{k: [v] for k, v in fields.items()},
        }
    )


def _seg_col(key_col, n_segments: int):
    return F.pmod(
        F.crc32(F.encode(key_col.cast("string"), "utf-8")), F.lit(n_segments)
    ).cast("int")


def bucket_of(term: str, n_buckets: int) -> int:
    """Driver-side bucket computation — must match F.crc32-based bucketing."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def read_manifests(spark: SparkSession, out_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(f"{out_dir}/manifests")
    except Exception:
        return None


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    config: BuildConfig | None = None,
    doc_key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    meta_cols: tuple[str, ...] = ("role", "tool", "ts"),
    force: bool = False,
) -> dict:
    """Build (or resume) the segmented inverted index. Returns build metrics.

    Resume (the working analogue of the reference's skip-if-present logic at
    import_dart_data.py:543-550 and its never-written corp_import_history):
    segments whose manifest row is ``committed`` with an unchanged input
    fingerprint are skipped; everything else is (re)built and its partitions
    atomically replaced via dynamic partition overwrite.
    """
    cfg = config or BuildConfig()
    t0 = time.time()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    base = transcripts.withColumn(
        "seg", _seg_col(F.col(doc_key_cols[0]), cfg.n_segments)
    )

    # --- per-segment input fingerprints (order-independent bit_xor) ---
    fp_df = base.groupBy("seg").agg(
        F.bit_xor(F.xxhash64(*doc_key_cols, text_col)).alias("input_fingerprint"),
        F.count("*").alias("n_docs_in"),
    )
    fingerprints = {r["seg"]: (r["input_fingerprint"], r["n_docs_in"]) for r in fp_df.collect()}

    manifests = read_manifests(spark, out_dir)
    done: set[int] = set()
    if manifests is not None and not force:
        latest = (
            manifests.filter(F.col("status") == "committed")
            .groupBy("partition_id")
            .agg(F.max_by("input_fingerprint", "created_ts").alias("fp"))
            .collect()
        )
        for r in latest:
            seg = r["partition_id"]
            if seg in fingerprints and fingerprints[seg][0] == r["fp"]:
                done.add(seg)
    todo = sorted(set(fingerprints) - done)
    if not todo:
        return {"built_segments": [], "skipped_segments": sorted(done), "elapsed_sec": time.time() - t0}

    # --- doc_id assignment over the FULL corpus (rank must be global) ---
    persisted: list = []
    try:
        return _build_segments(
            spark, base, out_dir, cfg, doc_key_cols, text_col, meta_cols,
            transcripts, fingerprints, todo, done, persisted, t0,
        )
    finally:
        for h in persisted:
            h.unpersist()


def _build_segments(
    spark, base, out_dir, cfg, doc_key_cols, text_col, meta_cols,
    transcripts, fingerprints, todo, done, persisted, t0,
):
    docs = assign_doc_ids(
        base, cfg.doc_id_partitions, key_cols=doc_key_cols, persisted=persisted
    )
    docs = docs.withColumn("tokens", tokenize_col(text_col)).withColumn(
        "dl", F.size("tokens").cast("long")
    )
    docs = docs.persist()
    persisted.append(docs)

    build_docs = docs.filter(F.col("seg").isin([int(s) for s in todo]))

    # --- doc_stats (metadata + length norms), per rebuilt segment ---
    stats_cols = list(
        dict.fromkeys(
            [
                "doc_id",
                *doc_key_cols,
                *[c for c in meta_cols if c in transcripts.columns],
                "dl",
                "seg",
            ]
        )
    )
    (
        build_docs.select(*stats_cols)
        .repartition("seg")
        .write.mode("overwrite")
        .partitionBy("seg")
        .parquet(f"{out_dir}/doc_stats")
    )

    # --- flat postings (term, doc_id, tf, dl) ---
    flat = (
        build_docs.select("seg", "doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("seg", "term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    flat = flat.persist()
    persisted.append(flat)

    # --- per-segment partial df (also drives run-salting of hot terms) ---
    seg_df = flat.groupBy("seg", "term").agg(F.count("*").alias("df_p"))
    seg_df.persist()
    persisted.append(seg_df)
    (
        seg_df.repartition("seg")
        .write.mode("overwrite")
        .partitionBy("seg")
        .parquet(f"{out_dir}/term_seg_df")
    )

    n_total_docs = docs.count()

    # --- explicit skew handling: split hot terms into range-disjoint runs ---
    hot = seg_df.filter(F.col("df_p") > cfg.target_run).withColumn(
        "nruns", F.ceil(F.col("df_p") / cfg.target_run).cast("int")
    ).select("seg", "term", "nruns")
    salted = flat.join(F.broadcast(hot), ["seg", "term"], "left").withColumn(
        "run",
        F.when(
            F.col("nruns").isNull(), F.lit(0)
        ).otherwise(
            (F.col("doc_id") * F.col("nruns") / F.lit(n_total_docs)).cast("int")
        ),
    )

    # --- grouped-map encode (Arrow batches; numpy inside; no per-row Python) ---
    encoded = salted.groupBy("seg", "term", "run").applyInPandas(
        _encode_group, schema=POSTINGS_SCHEMA
    )
    encoded = encoded.withColumn(
        "bucket", F.pmod(F.crc32(F.encode("term", "utf-8")), F.lit(cfg.n_buckets)).cast("int")
    )
    (
        encoded.repartition("seg", "bucket")
        .write.mode("overwrite")
        .partitionBy("seg", "bucket")
        .parquet(f"{out_dir}/postings")
    )

    # --- publish global term_dict + corpus_stats from per-seg partials ---
    publish_stats(spark, out_dir)
    _write_meta(out_dir, cfg, doc_key_cols, meta_cols)

    # --- manifests: real lineage (vs the reference's dead code) ---
    seg_metrics = {
        r["seg"]: (r["n_terms"], r["n_postings"])
        for r in seg_df.groupBy("seg")
        .agg(F.count("*").alias("n_terms"), F.sum("df_p").alias("n_postings"))
        .collect()
    }
    now = pd.Timestamp.utcnow().tz_localize(None)
    rows = []
    for seg in todo:
        fp, ndocs = fingerprints[seg]
        nt, npost = seg_metrics.get(seg, (0, 0))
        rows.append(
            (f"seg-{seg:05d}", int(seg), int(fp), int(ndocs), int(nt), int(npost), now, "committed")
        )
    mpdf = pd.DataFrame(
        rows,
        columns=[
            "seg_id", "partition_id", "input_fingerprint", "n_docs",
            "n_terms", "n_postings", "created_ts", "status",
        ],
    )
    spark.createDataFrame(mpdf).coalesce(1).write.mode("append").parquet(f"{out_dir}/manifests")

    elapsed = time.time() - t0
    return {
        "built_segments": todo,
        "skipped_segments": sorted(done),
        "n_docs": n_total_docs,
        "elapsed_sec": elapsed,
        "turns_per_sec": n_total_docs / elapsed if elapsed > 0 else None,
    }


def _write_meta(out_dir: str, cfg: BuildConfig, doc_key_cols, meta_cols) -> None:
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "n_segments": cfg.n_segments,
                "n_buckets": cfg.n_buckets,
                "target_run": cfg.target_run,
                "block_size": BLOCK_SIZE,
                "k1": K1,
                "b": B,
                "doc_key_cols": list(doc_key_cols),
                "meta_cols": list(meta_cols),
            },
            f,
        )


def publish_stats(spark: SparkSession, out_dir: str) -> None:
    """Derive global term_dict + corpus_stats from per-segment tables."""
    seg_df = spark.read.parquet(f"{out_dir}/term_seg_df")
    (
        seg_df.groupBy("term")
        .agg(F.sum("df_p").alias("df"))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_dict")
    )
    ds = spark.read.parquet(f"{out_dir}/doc_stats")
    stats = ds.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/corpus_stats")
