"""Interval-overlap join.

The reference stores quarter date_ranges per document and queries them with
ES range-overlap semantics (reference import_dart_data.py:436-440,628-641 —
the ``time_frame`` date_range field). The relational form is the interval
join  a.start <= b.end AND b.start <= a.end.

Scale design: a naive conditional join is a broadcast-nested-loop (O(|a|·|b|)
at 100 TB). Instead both sides are range-bucketized: each interval explodes
to the fixed-width buckets it covers (JVM sequence/explode, narrow), the
join runs as an equi-join on the bucket id (hash-partitioned, AQE-skew
eligible), the exact overlap predicate re-verifies, and each pair is kept
exactly once by claiming only the bucket containing max(a.start, b.start).
Bucket width trades fan-out (long intervals -> many buckets) against bucket
density; pick it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str | Column,
    a_end: str | Column,
    b_start: str | Column,
    b_end: str | Column,
    bucket_width: float,
) -> DataFrame:
    """Inner-join rows of ``a`` and ``b`` whose [start, end] intervals
    overlap (closed bounds, matching ES range-overlap). Start/end columns
    must be numeric (cast timestamps to epoch seconds first). Column names
    of ``a`` and ``b`` must not collide (alias/prefix beforehand)."""
    sa = F.col(a_start) if isinstance(a_start, str) else a_start
    ea = F.col(a_end) if isinstance(a_end, str) else a_end
    sb = F.col(b_start) if isinstance(b_start, str) else b_start
    eb = F.col(b_end) if isinstance(b_end, str) else b_end
    w = float(bucket_width)

    ax = a.withColumn(
        "_bk", F.explode(F.sequence(F.floor(sa / w), F.floor(ea / w)))
    )
    bx = b.withColumn(
        "_bk", F.explode(F.sequence(F.floor(sb / w), F.floor(eb / w)))
    )
    joined = ax.join(bx, "_bk").filter((sa <= eb) & (sb <= ea))
    # claim exactly one shared bucket per pair: the one holding the later start
    claim = F.floor(F.greatest(sa, sb) / w)
    return joined.filter(F.col("_bk") == claim).drop("_bk")
