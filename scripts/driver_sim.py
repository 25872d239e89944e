"""Local simulation of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from dart_importer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Two-level compare. The EXACT level mirrors the driver's value hash:
    columns sorted by name, every cell stringified as-is, order-insensitive.
    Representation drift the driver would flag (e.g. DuckDB HUGEINT -> float64
    rendering '128447.0' vs Spark's '128447') FAILS here even when values are
    numerically equal. The tolerant numeric level stays as a diagnostic so the
    failure message says whether the values themselves actually differ."""
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row counts differ: {len(a)} vs {len(b)}"
    a, b = normalize(a.copy()), normalize(b.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        numeric_ok = None
        try:
            af = pd.to_numeric(av, errors="raise").astype(float)
            bf = pd.to_numeric(bv, errors="raise").astype(float)
            numeric_ok = bool(((af - bf).abs().fillna(0) <= 1e-9).all())
        except (ValueError, TypeError):
            pass
        asv, bsv = av.astype(str), bv.astype(str)
        if not (asv == bsv).all():
            bad = asv != bsv
            kind = (
                "REPRESENTATION drift (values numerically equal — driver hash "
                "would still fail)" if numeric_ok else "values differ"
            )
            return (
                f"{kind} in {c}: {asv[bad].head(3).tolist()} vs "
                f"{bsv[bad].head(3).tolist()}"
            )
        if numeric_ok is False:
            bad = (af - bf).abs() > 1e-9
            return f"values differ in {c}: {av[bad].head(3).tolist()} vs {bv[bad].head(3).tolist()}"
    return None


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark("driver-sim", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        err = compare(got, want)
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
        only=sys.argv[2:] or None,
    )
