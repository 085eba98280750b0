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
    b = (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing (Spark's default, made explicit):
        # post-shuffle stages keep >= default-parallelism partitions when
        # the data supports it, while sub-minPartitionSize shuffles still
        # collapse to one task (no tiny-task storms). The previous
        # size-only setting (parallelismFirst=false) capped every
        # post-shuffle stage at data/64MB partitions, which at 10^5-URL
        # crawl rounds pinned the parse/window stages to ~4 tasks no
        # matter the core count — measured as flat N->4N round-loop
        # efficiency in BENCH/BASELINE.md §3 until this change.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND arr IS
        # NOT NULL` under every explode/posexplode. For a STORED array
        # column that can push a row-skip to the scan; every hot explode
        # in this engine is over a COMPUTED array (tokenize → segment →
        # explode), where the pushed filter inlines the whole expression
        # chain below the projection that staged it — re-evaluating the
        # tokenizer once per array element per row (the winnowing-
        # fingerprint O(n^3) lesson resurfacing inside the optimizer; see
        # DESIGN.md staged-projection rule). The filter is semantically
        # redundant — Generate itself emits nothing for empty arrays —
        # and the duplicated evaluation grows WITH data, so excluding the
        # rule is strictly better at every scale for this workload
        # (measured: host_line_dedup 2.3 -> 0.95 s at sf0.1, plans lose
        # the size(transform(...)) > 0 scan filter, results unchanged).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # diagnostic escape hatch: JSON dict of extra spark confs (e.g.
    # '{"spark.eventLog.enabled": "true", ...}') — lets profiling runs
    # attach event logs without changing call sites
    extra = os.environ.get("DISCO_SPARK_EXTRA")
    if extra:
        import json
        for k, v in json.loads(extra).items():
            b = b.config(k, v)
    return b.getOrCreate()
