"""Two-parallelism scaling benchmark (the BASELINE.json north-rule protocol).

The rule demands >=0.8 index-build throughput scaling efficiency between N
and 4N executors. No real cluster exists in this sandbox, so — per the
driver instruction — we evidence it by running the SAME job on the SAME
input at local[8] and local[32] (4x the cores), each in its own fresh JVM
launched through ``spark-submit --py-files engine.zip`` (the exact submit
form the rule names), and reporting throughput at both plus

    efficiency = (throughput_4N / throughput_N) / 4.

Usage:
    python scripts/bench_scaling.py                 # orchestrate both runs
    python scripts/bench_scaling.py --convs 30000   # bigger corpus
    (internal) spark-submit ... bench_scaling.py --worker --cores 8 ...

Writes one JSON line to stdout and refreshes the measured-numbers section
of BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["the and of", "삼성 전자 보고서", "w00042 w00123 w01000", "zq0marker"]


def make_engine_zip(dest: str) -> str:
    """Package dart_importer_spark as the --py-files artifact."""
    zpath = os.path.join(dest, "engine.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "dart_importer_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def worker(cores: int, corpus: str, out_json: str) -> None:
    """One measured run in this JVM: build index + run the query set."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    tr = spark.read.parquet(corpus)
    # warm the input page cache / JIT outside the measured window
    tr.count()

    idx_dir = tempfile.mkdtemp(prefix=f"scaling_idx_{cores}_")
    try:
        t0 = time.time()
        metrics = build_index(
            spark,
            tr,
            os.path.join(idx_dir, "idx"),
            BuildConfig(n_segments=8, n_buckets=16),
            force=True,
        )
        build_wall = time.time() - t0

        ix = InvertedIndex(spark, os.path.join(idx_dir, "idx"))
        q_times = []
        for q in QUERIES:
            tq = time.time()
            ix.topk(q, k=10).collect()
            q_times.append(time.time() - tq)

        result = {
            "cores": cores,
            "n_docs": metrics["n_docs"],
            "build_wall_sec": round(build_wall, 3),
            "build_turns_per_sec": round(metrics["n_docs"] / build_wall, 2),
            "query_wall_sec": [round(t, 3) for t in q_times],
            "query_p50_sec": round(sorted(q_times)[len(q_times) // 2], 3),
        }
        with open(out_json, "w") as f:
            json.dump(result, f)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


def orchestrate(n_convs: int, levels: tuple[int, ...] = (8, 32)) -> dict:
    sys.path.insert(0, REPO)
    from dart_importer_spark.datagen import generate_transcripts
    from dart_importer_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="scaling_bench_")
    corpus = os.path.join(work, "corpus")
    zpath = make_engine_zip(work)

    # one shared deterministic input, written once
    spark = get_spark("scaling-datagen", cores=32, shuffle_partitions=32)
    generate_transcripts(spark, n_convs).write.mode("overwrite").parquet(corpus)
    n_turns = spark.read.parquet(corpus).count()
    spark.stop()

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    results = {}
    for cores in levels:
        out_json = os.path.join(work, f"result_{cores}.json")
        cmd = [
            spark_submit,
            "--master", f"local[{cores}]",
            "--py-files", zpath,
            os.path.abspath(__file__),
            "--worker", "--cores", str(cores),
            "--corpus", corpus, "--out", out_json,
        ]
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        subprocess.run(cmd, check=True, env=env, cwd=work)
        with open(out_json) as f:
            results[cores] = json.load(f)

    lo, hi = min(levels), max(levels)
    tput_lo = results[lo]["build_turns_per_sec"]
    tput_hi = results[hi]["build_turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    summary = {
        "metric": "index_build_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "n_turns": n_turns,
        "levels": {str(k): v for k, v in results.items()},
        "protocol": f"same input, local[{lo}] vs local[{hi}], fresh JVM each, "
        "spark-submit --py-files engine.zip",
    }
    shutil.rmtree(work, ignore_errors=True)
    return summary


def write_bench_md(summary: dict) -> None:
    lo, hi = sorted(int(k) for k in summary["levels"])
    a, b = summary["levels"][str(lo)], summary["levels"][str(hi)]
    md = f"""# BENCH — measured numbers

## Two-parallelism scaling protocol (north rule: >=0.8 efficiency N -> 4N)

No real cluster in the sandbox; per the driver instruction the same
index-build job ran on the same {summary['n_turns']:,}-turn input at two
parallelism levels, each in a fresh JVM via `spark-submit --py-files
engine.zip`:

| parallelism | build wall (s) | build throughput (turns/s) | query p50 (s) |
|---|---|---|---|
| local[{lo}] | {a['build_wall_sec']} | {a['build_turns_per_sec']:,} | {a['query_p50_sec']} |
| local[{hi}] | {b['build_wall_sec']} | {b['build_turns_per_sec']:,} | {b['query_p50_sec']} |

**Scaling efficiency = (tput_{hi} / tput_{lo}) / ({hi}/{lo}) =
{summary['value']:.3f}** (target >= 0.8).

Reproduce: `python scripts/bench_scaling.py --convs {max(1, a['n_docs'] // 9)}`
(seeded datagen; deterministic input).

The headline per-round benchmark (`bench.py`, sf0.1 suite) is recorded by
the driver as `BENCH_r{{N}}.json`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus")
    ap.add_argument("--out")
    ap.add_argument("--convs", type=int, default=30000)
    args = ap.parse_args()
    if args.worker:
        worker(args.cores, args.corpus, args.out)
        return
    summary = orchestrate(args.convs)
    write_bench_md(summary)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
