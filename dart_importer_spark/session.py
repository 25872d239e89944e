"""SparkSession factory with the configs this engine relies on.

Local-mode testing uses ``local[N]``; the same conf block is what we would
submit with ``spark-submit --py-files`` on a real cluster (AQE on, Arrow on,
shuffle partitions sized to parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dart_importer_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    cores=None -> ``local[*]``. ``shuffle_partitions`` defaults to the core
    count so local shuffles don't fan out into 200 tiny tasks.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(cores_env) if cores_env else (os.cpu_count() or 4)

    # Make this package importable inside executor Python workers no matter
    # where the driver script lives (the local-mode analogue of
    # ``spark-submit --py-files engine.zip``).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Engine daemon module: stock pyspark.daemon minus ~150 ms of
        # per-task worker CPU (zipimport cache re-read + full-heap gc) —
        # see dart_importer_spark/pydaemon.py. Public conf, any scale.
        .config("spark.python.daemon.module", "dart_importer_spark.pydaemon")
        # JVM<->Python-worker transport over unix domain sockets (Spark
        # 4.1): workers are always executor-host-local, so this is a pure
        # IPC choice — measured ~40 ms less per Python-stage job (79->38
        # ms trivial-job floor, -13..-33% on positional/Arrow queries).
        .config("spark.python.unix.domain.socket.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
