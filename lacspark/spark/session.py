"""SparkSession factory with the engine's scale posture baked in.

AQE (coalesce + skew-join split), Arrow-batched python UDF transfer
(the reference's LoD ragged batching ≙ Arrow list arrays, SURVEY §4.1),
and a shuffle-partition default sized for local[N] testing.  On a real
cluster the same builder runs under spark-submit --py-files with
executor counts supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lacspark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size is the engine's batching knob (≙ the
        # reference's LoD batch size); ~1k rows keeps the numpy
        # working set cache-resident inside the UDF.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("LACSPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # bucket replay overwrites only the partitions it touches —
        # makes pipeline re-runs idempotent after a mid-write crash
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # session-catalog managed tables (catalog.py tier 2) live
        # outside the repo working tree
        .config("spark.sql.warehouse.dir",
                os.environ.get("LACSPARK_WAREHOUSE",
                               "/tmp/lacspark-warehouse"))
        # single math thread per python worker: Spark already
        # parallelizes by partition (≙ SetCpuMathLibraryNumThreads(1),
        # c++/src/lac.cpp:46)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        # fork workers from a daemon that has pandas/pyarrow/numpy and
        # the engine stack ALREADY imported (copy-on-write): a cold
        # 32-way python stage otherwise runs 32 simultaneous ~0.5 s
        # import chains — the dominant term of every cold UDF stage
        # (lacspark.spark.py_daemon; public knob, worker loop
        # unchanged)
        .config("spark.python.daemon.module", "lacspark.spark.py_daemon")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
