"""Portable 60-bit hash shared by Spark and the DuckDB correctness oracles.

xxhash64 (Spark's fastest built-in 64-bit hash) has no DuckDB equivalent, so
operators whose OUTPUT is hash-valued (document fingerprints, SimHash
signatures) default to a hash both engines compute bit-identically: the
first 15 hex chars of md5(utf8-bytes) parsed as an integer. 60 bits keeps
the value non-negative in an int64 on both sides and leaves headroom for
bit-packing. md5 is slower than xxhash64 but still fully JVM-side in Spark
(whole-stage codegen); operators keep a ``hash_fn`` hook for swapping
xxhash64 back in when oracle parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_HASH_BITS = 60


def md5_60(col: str | Column) -> Column:
    """First 60 bits of md5 as a non-negative long (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def duckdb_md5_60(expr: str) -> str:
    """The DuckDB SQL expression computing the same value as ``md5_60``."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
