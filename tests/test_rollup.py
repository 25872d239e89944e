"""Hypertable rollup: materialized partial aggregates answer coarser
queries EXACTLY (semigroup re-merge), refuse finer ones, and the
persisted layout is partition-pruned by month."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.operators.rollup import build_rollup, query_rollup


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    for i in range(200):
        rows.append((
            i,
            dt.datetime(2024, 1 + (i % 3), 1 + (i % 27), i % 24, 13, 0),
            ["a", "b"][i % 2],
            float(i % 17),
        ))
    rows.append((999, None, "a", 5.0))  # null ts dropped
    return spark.createDataFrame(rows, "id long, ts timestamp, kind string, v double")


def test_rollup_matches_direct_aggregation(spark, events):
    ru = build_rollup(events, "ts", "v", interval="hour", dims=("kind",))
    got = query_rollup(ru, "hour", "day", dims=("kind",)).toPandas()
    direct = (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"),
                          "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "kind",
        )
        .agg(
            F.count("v").alias("count"),
            F.round(F.sum("v"), 6).alias("sum"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.round(F.avg("v"), 6).alias("avg"),
        )
        .orderBy("bucket", "kind")
        .toPandas()
    )
    for c in ("bucket", "kind", "count", "sum", "min", "max"):
        assert list(got[c]) == list(direct[c]), c
    for g, w in zip(got["avg"], direct["avg"]):
        assert abs(g - w) < 1e-6


def test_rollup_coarsen_to_month_and_stddev(spark, events):
    import numpy as np

    ru = build_rollup(events, "ts", "v", interval="day")
    got = query_rollup(ru, "day", "month").toPandas()
    pdf = events.filter(F.col("ts").isNotNull()).toPandas()
    pdf["bucket"] = pdf["ts"].dt.to_period("M").dt.start_time.dt.strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    for _, row in got.iterrows():
        sub = pdf[pdf["bucket"] == row["bucket"]]["v"].to_numpy()
        assert row["count"] == len(sub)
        assert abs(row["stddev_pop"] - round(float(np.std(sub)), 6)) < 1e-5
        assert abs(row["avg"] - round(float(np.mean(sub)), 6)) < 1e-6


def test_rollup_refusals(spark, events):
    ru = build_rollup(events, "ts", "v", interval="day")
    with pytest.raises(ValueError, match="finer"):
        query_rollup(ru, "day", "hour")
    with pytest.raises(ValueError):
        build_rollup(events, "ts", "v", interval="minute")
    with pytest.raises(ValueError):
        query_rollup(ru, "fortnight")


def test_rollup_persisted_partition_pruning(spark, events, tmp_path):
    out = str(tmp_path / "ru")
    ru = build_rollup(events, "ts", "v", interval="hour", dims=("kind",),
                      out_path=out)
    jan = query_rollup(
        ru, "hour", "month", dims=("kind",),
        where=F.col("bucket") < "2024-02-01",
    )
    pdf = jan.toPandas()
    assert set(pdf["bucket"]) == {"2024-01-01 00:00:00"}
    # the month partition key prunes the read when filtering on `part`
    pruned = spark.read.parquet(out).filter(F.col("part") == "2024-01")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
