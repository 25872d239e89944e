"""Run a SUBSET of the driver gate rows: `python scripts/gate_one.py
ft_sqs_or ft_sqs_and [--sf /root/testdata/sf0.01]` — same compare logic as
driver_sim, but only the named queries()/oracle_sql() entries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from dart_importer_spark.session import get_spark
from scripts.driver_sim import TABLES, compare


def main(names: list[str], sf_dir: str):
    spark = get_spark("gate-one", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = 0
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        err = compare(got, want)
        if err:
            fails += 1
            print(f"FAIL {name}: {err}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    main(args, sf)
