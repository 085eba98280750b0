"""Decompose the round loop's hot job to find which component limits
4->16-core scaling: the cached-corpus fetch join + parquet write alone
("scan"), or the same plus the pandas-UDF parse ("parse").

Usage: python scripts/iso_scaling.py <mode> <master> [n_hosts]
Prints one JSON line; run each (mode, master) in its OWN process (the
shared-JVM contamination lesson, BENCH/CRAWL_BISECT.md round-4 #2).
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(mode, master, n_hosts):
    from pyspark.sql import SparkSession, functions as F
    import bench
    from disco_crawl_spark import udfs

    n = int(master.split("[")[1].rstrip("]"))
    spark = (SparkSession.builder.appName("iso-scaling").master(master)
             .config("spark.sql.shuffle.partitions", str(n))
             .config("spark.default.parallelism", str(n))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    pages = bench.synth_crawl_pages(spark, n_hosts)
    cached = (pages.repartition(F.col("url"))
              .sortWithinPartitions("url").persist())
    cached.count()
    hosts = spark.range(n_hosts).select(F.col("id").alias("h"))
    sched = (hosts
             .select("h",
                     F.explode(F.sequence(F.lit(0), F.lit(49))).alias("j"))
             .select(F.concat(F.lit("site"), F.col("h"), F.lit(".gov.au"))
                     .alias("host"),
                     F.concat(F.lit("https://site"), F.col("h"),
                              F.lit(".gov.au/s0/p"), F.col("j"),
                              F.lit(".html")).alias("fetch_url")))
    fetched = sched.join(
        cached.select(F.col("url").alias("fetch_url"), "html", "warc_ts",
                      "redirect_to"), "fetch_url", "left")
    if mode == "parse":
        p = fetched.withColumn(
            "p", udfs.parse_page(F.col("html"), F.col("fetch_url"),
                                 F.col("host"), F.lit("https"),
                                 F.col("redirect_to")))
        out = p.select("host", F.col("fetch_url").alias("url"),
                       F.col("p.links").alias("links"),
                       F.col("p.title").alias("title"),
                       F.col("p.text").alias("text"))
    elif mode == "scan":
        out = fetched.select("host", F.col("fetch_url").alias("url"),
                             F.length("html").alias("html_len"),
                             F.substring("html", 1, 64).alias("head"))
    else:
        raise SystemExit(f"unknown mode {mode}")
    tmp = tempfile.mkdtemp(prefix="iso_out_")
    walls = []
    try:
        for _ in range(3):
            t0 = time.time()
            out.write.mode("overwrite").parquet(os.path.join(tmp, "b"))
            walls.append(round(time.time() - t0, 2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"mode": mode, "master": master, "n_hosts": n_hosts,
                      "walls": walls, "best": min(walls)}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 2000)
