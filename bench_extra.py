"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Usage:
    python bench_extra.py build            # index builds with per-phase timings
    python bench_extra.py ivf              # IVF build timing
    python bench_extra.py q NAME [reps]    # time one declared query (collect)
    python bench_extra.py noop NAME [reps] # time it through the noop sink
    python bench_extra.py plan NAME FILE   # write .explain("formatted") to FILE
    python bench_extra.py suite N1,N2,...  # time a comma-list of queries once each

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from dart_importer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    return get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)


def main() -> None:
    cmd = sys.argv[1]
    spark = _spark()
    key = os.path.abspath(SF_DIR).strip("/").replace("/", "_")
    if cmd == "build":
        import tempfile

        from dart_importer_spark.datagen import generate_transcripts
        from dart_importer_spark.index.build import BuildConfig, build_index

        for i in range(int(sys.argv[2]) if len(sys.argv) > 2 else 3):
            shutil.rmtree(os.path.join("/tmp/dis_entry_index_v7", key), ignore_errors=True)
            entry._INDEX_CACHE.clear()
            t0 = time.time()
            entry._documents_index(spark, SF_DIR)
            print(f"documents_index[{i}]: {time.time() - t0:.3f}s")
        tr = generate_transcripts(spark, n_convs=4000)
        for i in range(int(sys.argv[2]) if len(sys.argv) > 2 else 3):
            tdir = tempfile.mkdtemp(prefix="bx_tidx_")
            try:
                t0 = time.time()
                m = build_index(
                    spark, tr, os.path.join(tdir, "idx"),
                    BuildConfig(n_segments=8, n_buckets=16),
                )
                print(f"transcripts[{i}]: {time.time() - t0:.3f}s phases={m.get('phases')}")
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
    elif cmd == "ivf":
        for i in range(int(sys.argv[2]) if len(sys.argv) > 2 else 2):
            shutil.rmtree(os.path.join("/tmp/dis_entry_ivf_v3", key), ignore_errors=True)
            entry._IVF_CACHE.clear()
            t0 = time.time()
            entry._ivf_index(spark, SF_DIR)
            print(f"ivf_build[{i}]: {time.time() - t0:.3f}s")
    elif cmd in ("q", "noop"):
        name = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        fn = entry.queries()[name]
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}[{i}]")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if cmd == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            print(f"{name}[{i}]: {time.time() - t0:.3f}s")
    elif cmd == "plan":
        name, out = sys.argv[2], sys.argv[3]
        fn = entry.queries()[name]
        df = fn(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out}")
    elif cmd == "suite":
        names = sys.argv[2].split(",")
        qs = entry.queries()
        total = 0.0
        for name in names:
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            dt = time.time() - t0
            total += dt
            print(f"{name}: {dt:.3f}s")
        print(f"total: {total:.3f}s")
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
