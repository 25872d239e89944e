"""Gap-based sessionization — the batch form of the classic streaming
sessionizer (training pipelines cut event/interaction logs into sessions
before feature extraction; the transcripts table's conv_id plays this role
natively, so this operator generalizes it to raw event streams).

One hash shuffle on the user key; per-user ordering handled by the window
sort. At 100 TB: partition count follows spark.sql.shuffle.partitions /
AQE; per-user state is a lag + running sum (no collect, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: float = 1800.0,
    order_tiebreak: str | None = None,
    out: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session sequence number: a new session starts when
    the gap since the user's previous event exceeds ``gap_sec``. Pass an
    ``order_tiebreak`` column to make ordering (and thus the output)
    deterministic under equal timestamps."""
    order_cols: list[Column] = [F.col(ts_col)]
    if order_tiebreak is not None:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    # cast via timestamp keeps fractional seconds (TIMESTAMP_NTZ-safe)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(sec).over(w)
    new_session = (prev.isNull() | ((sec - prev) > gap_sec)).cast("int")
    return df.withColumn(out, F.sum(new_session).over(w))
