"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode knobs are sandbox stand-ins for cluster settings; every
config here is also what we'd set on a 1000-executor cluster except
master/driver-memory (spark-submit supplies those there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgt",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local-mode worker Python processes inherit PYTHONPATH from the
    # driver's env, NOT the driver's sys.path — make the package root
    # importable for them so entry points work from any cwd (on a real
    # cluster spark-submit --py-files kgt.zip ships the package
    # instead, see jobs/build_graph.py). NB this mutation is PROCESS-
    # GLOBAL: every child process spawned after it sees the package
    # root on PYTHONPATH, not just Spark workers — so it runs only
    # when no session exists yet (i.e. when this call will actually
    # create one; getOrCreate reuses an existing session without
    # launching new workers).
    if SparkSession.getActiveSession() is None:
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_root + (os.pathsep + existing if existing else "")
            )
    if shuffle_partitions is None:
        # ~cores locally; on a real cluster this scales with executors
        # (or is left to AQE coalescing from a higher initial value)
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch memory: conversations vary in length
        # (SURVEY §4 explicit-engineering item 2)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("KGT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
