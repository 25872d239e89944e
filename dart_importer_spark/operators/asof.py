"""As-of (point-in-time) join: attach to each left row the most recent right
row at-or-before its timestamp, per key — the feature-store/backtest staple
(pandas merge_asof / DuckDB ASOF JOIN) that Spark has no built-in for.

Scale design: ONE shuffle, no range explosion. Both sides are tagged and
unioned; a window partitioned by the join key and ordered by
(ts, right-before-left) carries the right payload forward with
last(ignoreNulls) — the classic union-tag formulation. Cost is a single
repartition + sort on the key, identical to what a groupBy would shuffle;
per-key state during the window scan is one payload struct, so skewed keys
stream instead of buffering. No driver-side work, no UDF.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: float | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """Backward as-of join (the pandas merge_asof default): for each left
    row, the right row with the greatest ``right_ts`` <= ``left_ts`` in the
    same ``on`` group, or NULLs when none exists.

    ``tolerance`` (same units as the ts columns' ordering type, e.g. seconds
    for double-epoch columns) voids matches older than ``left_ts -
    tolerance``. ``right_prefix`` renames the attached right columns to
    avoid clashes. Ties on (key, right_ts): if the right side has duplicate
    timestamps per key, one row wins arbitrarily — deduplicate first if that
    matters (the contract DuckDB's ASOF JOIN shares).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {c: f"{right_prefix}{c}" for c in payload_cols}

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}"
                for c in payload_cols
            )
            + ">"
        )
        .alias("_payload"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    ).select(*l_tagged.columns)  # align column order for the union

    # right rows sort BEFORE left rows at equal ts: the match is inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last non-null right struct up to and including the current row
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn(
            "_right_seen",
            F.last(
                F.when(
                    F.col("_is_right") == 1,
                    F.struct("_payload", F.col("_asof_ts").alias("_mts")),
                ),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("_is_right") == 0)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "_right_seen",
            F.when(
                F.col("_asof_ts") - F.col("_right_seen._mts") <= F.lit(tolerance),
                F.col("_right_seen"),
            ),
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col(f"_right_seen._payload.`{c}`").alias(out_names[c])
        for c in payload_cols
    ]
    return carried.select(*out_cols)
