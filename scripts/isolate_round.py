"""Isolate the leaf-round fetch-parse job to find the anti-scaling term.

One crawl round's hot job is: schedule (50k urls) JOIN url-partitioned
cached pages -> parse_page pandas UDF -> wide projection -> parquet append.
The full-loop profile shows this job running SLOWER at local[16] than
local[4] while the bulk benchmark (same parse, no cached join / no write)
scales cleanly, so this script times the stages separately:

  A  join + parse + count()            (no write)
  B  join + parse + write parquet      (the round's real shape)
  C  B with the cache replaced by a re-read of a parquet pages table

Prints per-phase wall seconds and the process-tree CPU seconds consumed
(user+sys, from /proc/stat deltas) so box noise is visible.
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:8]]
    idle = vals[3] + vals[4]
    busy = sum(vals) - idle
    return busy, idle


def run(master):
    from pyspark.sql import functions as F
    import bench
    from disco_crawl_spark import udfs
    from disco_crawl_spark import functions as cf

    spark = bench._spark(master)
    n_hosts = 1000
    pages = bench.synth_crawl_pages(spark, n_hosts)
    cached = pages.repartition(F.col("url")).persist()
    cached.count()

    # a leaf-round schedule: 50 leaf urls per host (sections 0, j 0..49)
    hosts = spark.range(n_hosts).select(F.col("id").alias("h"))
    sched = (hosts
             .select("h", F.explode(F.sequence(F.lit(0), F.lit(49))).alias("j"))
             .select(
                 F.concat(F.lit("site"), F.col("h"), F.lit(".gov.au"))
                 .alias("host"),
                 F.concat(F.lit("https://site"), F.col("h"),
                          F.lit(".gov.au/s0/p"), F.col("j"),
                          F.lit(".html")).alias("fetch_url")))

    def parsed_of(pages_side):
        fetched = sched.join(
            pages_side.select(F.col("url").alias("fetch_url"), "html",
                              "warc_ts", "redirect_to"),
            "fetch_url", "left")
        p = fetched.withColumn(
            "p", udfs.parse_page(F.col("html"), F.col("fetch_url"),
                                 F.col("host"), F.lit("https"),
                                 F.col("redirect_to")))
        return p.select(
            "host", F.col("fetch_url").alias("url"),
            cf.host_group(F.col("host")).alias("host_group"),
            F.col("p.links").alias("links"),
            F.col("p.title").alias("title"),
            F.col("p.content_hash").alias("content_hash"),
            F.col("p.text").alias("text"))

    out = {}

    def phase(name, fn):
        b0, i0 = cpu_times()
        t0 = time.time()
        fn()
        wall = time.time() - t0
        b1, i1 = cpu_times()
        hz = os.sysconf("SC_CLK_TCK")
        out[name] = (round(wall, 2), round((b1 - b0) / hz, 1),
                     round((i1 - i0) / hz, 1))
        print(f"{master} {name}: wall={wall:.2f}s "
              f"box_busy={(b1 - b0) / hz:.0f}s box_idle={(i1 - i0) / hz:.0f}s",
              flush=True)

    tmp = tempfile.mkdtemp(prefix="iso_")
    try:
        phase("A_join_parse_count", lambda: parsed_of(cached).count())
        phase("A2_repeat", lambda: parsed_of(cached).count())
        phase("B_join_parse_write", lambda: parsed_of(cached).write
              .mode("overwrite").parquet(os.path.join(tmp, "b")))
        # pages from parquet instead of the in-memory cache
        pq = os.path.join(tmp, "pages")
        pages.write.mode("overwrite").parquet(pq)
        ppq = spark.read.parquet(pq)
        phase("C_pq_join_parse_write", lambda: parsed_of(ppq).write
              .mode("overwrite").parquet(os.path.join(tmp, "c")))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    return out


if __name__ == "__main__":
    for m in sys.argv[1:] or ("local[4]", "local[16]"):
        run(m)
