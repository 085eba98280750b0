"""SparkSession construction with the engine's standard configuration.

Tuned for correctness-first local runs that still reflect the 100 TB design:
AQE on (runtime re-planning, skew-join splitting), Arrow on (all per-row
Python is vectorized pandas UDFs), broadcast threshold left default (small
dimension tables broadcast), shuffle partitions sized to the machine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app: str = "disco_crawl_spark",
    master: "str | None" = None,
    shuffle_partitions: "int | None" = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    return (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions purely by size: without this AQE
        # refuses to go below defaultParallelism and tiny state-table
        # shuffles become 32-task storms whose dispatch latency dominates
        # crawl-round time (the same setting avoids tiny-task storms on a
        # real cluster)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
