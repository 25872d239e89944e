"""Hypertable rollup: materialized time-bucket aggregates with a
rollup-aware query path.

The classic continuous-aggregate design (TimescaleDB continuous
aggregates / ES rollup jobs / Druid rollup): raw events are folded once
into a small table of per-(bucket, dims) PARTIAL aggregates — count,
sum, min, max, and sum-of-squares so averages and variances recompose —
and queries at the rollup's granularity or any coarser multiple are
answered from the rollup table alone. At 100 TB the raw table is read
once at ingest; every dashboard query after that reads the rollup
(orders of magnitude smaller, partitioned by coarse time so range
predicates prune partitions).

Re-aggregation correctness: every stored statistic is a semigroup
(count/sum/min/max/sumsq merge associatively), so coarsening day →
month is exact, not approximate — the same partial-aggregate algebra
Spark's own map-side combine uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_INTERVALS = ["hour", "day", "week", "month", "quarter", "year"]


def build_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    interval: str = "hour",
    dims: tuple[str, ...] = (),
    out_path: str | None = None,
) -> DataFrame:
    """Fold raw rows into per-(bucket, dims) partial aggregates at
    ``interval`` granularity. Writes to ``out_path`` partitioned by a
    coarse partition key (the bucket's year-month) when given, so later
    time-range queries prune whole directories.

    One shuffle on (bucket, dims) — the only pass ever made over the raw
    table; everything downstream reads the rollup."""
    if interval not in _INTERVALS:
        raise ValueError(f"build_rollup: interval must be one of {_INTERVALS}")
    bucket = F.date_trunc(interval, F.col(time_col))
    v = F.col(value_col).cast("double")
    agg = (
        df.filter(F.col(time_col).isNotNull())
        .groupBy(bucket.alias("bucket"), *[F.col(d) for d in dims])
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("vsum"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.sum(v * v).alias("vsumsq"),
        )
    )
    if out_path is not None:
        (
            agg.withColumn("part", F.date_format("bucket", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("part")
            .parquet(out_path)
        )
        return df.sparkSession.read.parquet(out_path).drop("part")
    return agg


def query_rollup(
    rollup: DataFrame,
    interval: str,
    target_interval: str | None = None,
    dims: tuple[str, ...] = (),
    where=None,
) -> DataFrame:
    """Answer an aggregate query FROM the rollup table: re-bucket to
    ``target_interval`` (must be the rollup's own granularity or
    coarser — finer would need raw data; raises), optionally filter
    (``where`` is a Column over bucket/dims — pushes into the rollup
    scan), and recompose count / sum / min / max / avg / stddev_pop from
    the stored partials. Returns one row per (bucket, dims) with bucket
    emitted as 'yyyy-MM-dd HH:mm:ss' (the engine's oracle-portable date
    format), ordered by bucket then dims."""
    target = target_interval or interval
    if interval not in _INTERVALS or target not in _INTERVALS:
        raise ValueError(f"query_rollup: intervals must be in {_INTERVALS}")
    if _INTERVALS.index(target) < _INTERVALS.index(interval):
        raise ValueError(
            f"query_rollup: cannot answer {target!r} from a {interval!r} "
            f"rollup — finer than stored granularity (re-aggregate raw data)"
        )
    src = rollup if where is None else rollup.filter(where)
    bucket = F.date_format(
        F.date_trunc(target, F.col("bucket")), "yyyy-MM-dd HH:mm:ss"
    )
    n, s, ss = F.sum("n"), F.sum("vsum"), F.sum("vsumsq")
    return (
        src.groupBy(bucket.alias("bucket"), *[F.col(d) for d in dims])
        .agg(
            n.alias("count"),
            F.round(s, 6).alias("sum"),
            F.min("vmin").alias("min"),
            F.max("vmax").alias("max"),
            F.round(s / n, 6).alias("avg"),
            # population variance from the merged moments:
            # E[x^2] - E[x]^2, clamped at 0 against float cancellation
            F.round(
                F.sqrt(F.greatest(ss / n - (s / n) * (s / n), F.lit(0.0))), 6
            ).alias("stddev_pop"),
        )
        .orderBy("bucket", *[F.asc(d) for d in dims])
    )
