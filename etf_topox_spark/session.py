"""SparkSession factory.

Tests and bench.py use this; the driver supplies its own session to
``__spark_entry__``. Everything here is plain public Spark configuration:
AQE on (skew-join backstop per SURVEY.md §4.3), Arrow enabled for the
pandas-UDF kernels, shuffle partitions pinned for the small local corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etf-topox-spark",
    cores: str | int | None = None,
    shuffle_partitions: int = 32,
    arrow_batch: int = 4096,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    cores defaults to $SPARK_GRAFT_CPUS, else all cores. arrow_batch is
    deliberately below the 10k default: image-bytes kernels carry binary
    payloads that blow past the default batch memory envelope
    (SURVEY.md §2.B X-note).
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.appName(app_name)
        # local[N,2]: allow ONE task retry. Spark 4.1's single-threaded
        # Python-runner feed (writeAdditionalInputToPythonWorker pulling a
        # chained upstream Python runner inside the reader's select loop)
        # can rarely deadlock on fused mapInPandas→mapInPandas stages (both
        # sides observed blocked: worker in tcp_sendmsg, JVM in EPoll.wait,
        # jstack'd 2026-08-17 during a local[2] bench trial). The
        # idle-timeout watchdog below kills the wedged worker; the retry
        # then reruns the (deterministic, map-side) task cleanly instead of
        # failing the job.
        .master(f"local[{cores},2]")
        .config("spark.python.worker.idleTimeoutSeconds", "300")
        .config("spark.python.worker.killOnIdleTimeout", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    # ship the package zip to Python workers (by-reference pickles; see
    # registry._ship_package) — idempotent per context
    from etf_topox_spark.registry import _ship_package

    _ship_package()
    return spark
