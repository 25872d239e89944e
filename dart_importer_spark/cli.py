"""Command-line entry point — the Spark-native counterpart of the
reference's argparse CLI (reference import_dart_data.py:682-719: main with
--import-data / --delete-index / --check-imported and the query helpers in
test.py). Runs under plain python or spark-submit:

    python -m dart_importer_spark build   --input tx.parquet --index ./idx
    python -m dart_importer_spark append  --input new.parquet --index ./idx
    python -m dart_importer_spark query   --index ./idx --q "삼성 전자" --k 10
    python -m dart_importer_spark count   --index ./idx [--where "role='user'"]
    python -m dart_importer_spark delete  --index ./idx --where "role='tool'"
    python -m dart_importer_spark compact --index ./idx --out ./idx2
    python -m dart_importer_spark refresh --landing ./landing --index ./idx

Results print as JSON lines (machine-readable, like the reference's
dump_json helpers).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _spark(args):
    from .session import get_spark

    return get_spark("dart-importer-spark-cli", cores=args.cores)


def _cfg(args):
    from .index.build import BuildConfig

    return BuildConfig(n_segments=args.segments, n_buckets=args.buckets)


def _build_kwargs(args) -> dict:
    kw: dict = {"doc_key_cols": tuple(args.key_cols)}
    if args.text_cols:
        kw["text_cols"] = tuple(args.text_cols)
    else:
        kw["text_col"] = args.text_col
    if args.shingle:
        kw["shingle_fields"] = tuple(
            (s.rsplit(":", 1)[0], int(s.rsplit(":", 1)[1])) for s in args.shingle
        )
    return kw


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dart_importer_spark")
    ap.add_argument("--cores", type=int, default=8)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_build_opts(p):
        p.add_argument("--segments", type=int, default=8)
        p.add_argument("--buckets", type=int, default=16)
        p.add_argument("--key-cols", nargs="+", default=["conv_id", "turn_idx"])
        p.add_argument("--text-col", default="text")
        p.add_argument("--text-cols", nargs="+", default=None)
        p.add_argument("--shingle", nargs="+", default=None,
                       help="search_as_you_type subfields, e.g. text:2 text:3")

    p = sub.add_parser("build")
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--force", action="store_true")
    add_build_opts(p)

    p = sub.add_parser("append")
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--tag", default="cli")
    add_build_opts(p)

    p = sub.add_parser("query")
    p.add_argument("--index", required=True)
    p.add_argument("--q", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--mode", choices=["or", "and"], default="or")
    p.add_argument("--field", default=None)
    p.add_argument("--where", default=None)
    p.add_argument("--offset", type=int, default=0)

    p = sub.add_parser("count")
    p.add_argument("--index", required=True)
    p.add_argument("--where", default=None)

    p = sub.add_parser("delete")
    p.add_argument("--index", required=True)
    p.add_argument("--where", required=True)

    p = sub.add_parser("compact")
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("refresh")
    p.add_argument("--landing", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--schema", default=None,
                   help="DDL schema of landing files (default: transcripts)")
    add_build_opts(p)

    args = ap.parse_args(argv)
    spark = _spark(args)

    if args.cmd == "build":
        from .index.build import build_index

        m = build_index(
            spark, spark.read.parquet(args.input), args.index, _cfg(args),
            force=args.force, **_build_kwargs(args),
        )
        print(json.dumps({k: v for k, v in m.items() if k != "phases"}, default=str))
    elif args.cmd == "append":
        from .index.build import append_index

        m = append_index(
            spark, spark.read.parquet(args.input), args.index,
            batch_tag=args.tag, **_build_kwargs(args),
        )
        print(json.dumps(m, default=str))
    elif args.cmd == "query":
        from .query.engine import InvertedIndex

        ix = InvertedIndex(spark, args.index)
        flt = F.expr(args.where) if args.where else None
        rows = ix.topk(
            args.q, k=args.k, mode=args.mode, field=args.field,
            filters=flt, offset=args.offset, with_meta=True,
        ).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    elif args.cmd == "count":
        from .query.engine import InvertedIndex

        ix = InvertedIndex(spark, args.index)
        flt = F.expr(args.where) if args.where else None
        print(json.dumps({"count": ix.count(flt)}))
    elif args.cmd == "delete":
        from .query.engine import InvertedIndex

        ix = InvertedIndex(spark, args.index)
        print(json.dumps({"deleted": ix.delete_by_query(F.expr(args.where))}))
    elif args.cmd == "compact":
        from .index.merge import compact_index

        print(json.dumps(compact_index(spark, args.index, args.out), default=str))
    elif args.cmd == "refresh":
        from .datagen import TRANSCRIPTS_SCHEMA
        from .streaming.refresh import incremental_refresh

        schema = args.schema or TRANSCRIPTS_SCHEMA
        ms = incremental_refresh(
            spark, args.landing, args.index, schema, _cfg(args), **_build_kwargs(args)
        )
        print(json.dumps(ms, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
