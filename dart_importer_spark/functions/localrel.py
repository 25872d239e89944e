"""Arrow-backed local relations.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the rows
into ``defaultParallelism`` pickled slices; every downstream action then
pays one Python-worker round trip per slice — measured ~0.25 s per use at
local[32] for a ONE-ROW table, multiplied across every query that builds a
small driver-side table (contract rows, ratings, query tables, rule sets).
Routing through pandas produces a single Arrow-backed LocalRelation: same
rows, same schema (fields are assigned positionally), ~10× cheaper, and on
a real cluster it removes a per-slice task wave per action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small driver-side row
    lists, built as ONE Arrow local relation instead of ``defaultParallelism``
    pickled slices. ``rows`` is a list of tuples; ``schema`` a DDL string.
    Falls back to the classic path when pandas/Arrow conversion rejects the
    values (e.g. exotic nested types) — behavior, not performance, is the
    contract."""
    import pandas as pd

    rows = list(rows)
    try:
        n_fields = len(schema.split(","))
        pdf = pd.DataFrame(rows, columns=[f"_c{i}" for i in range(n_fields)])
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def lit_double_array(values):
    """array<double> literal column from a Python sequence in ONE py4j
    round trip. ``F.array(*[F.lit(float(x)) for x in vec])`` costs dim+1
    py4j calls (~0.13 s of driver time for a 64-dim vector, paid at every
    query construction); rendering the repr of each double into a single
    SQL ``array(...)`` expression is one call and bit-exact — Python repr
    is the shortest round-trip decimal form and the SQL parser reads it
    back with Double.parseDouble, which recovers the identical IEEE value.
    Non-finite values (no SQL literal form) fall back to the classic path.
    """
    import math

    from pyspark.sql import functions as F

    vals = [float(v) for v in values]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")
