"""Event-log stage breakdown of the isolated leaf-round write job.

Usage: python scripts/ev_stage_breakdown.py local[16]
Runs the job in THIS process (fresh JVM), writes an uncompressed event
log, and prints per-stage wall / summed task run time / max task time —
the data that separates "not enough tasks", "skew", and "serial driver
tail" explanations for poor core-count scaling.
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(master):
    from pyspark.sql import SparkSession, functions as F
    import bench
    from disco_crawl_spark import udfs

    n = int(master.split("[")[1].rstrip("]"))
    evdir = tempfile.mkdtemp(prefix="evlog_")
    spark = (SparkSession.builder.appName("iso-ev").master(master)
             .config("spark.sql.shuffle.partitions", str(n))
             .config("spark.default.parallelism", str(n))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.dir", evdir)
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    n_hosts = 1000
    pages = bench.synth_crawl_pages(spark, n_hosts)
    cached = pages.repartition(F.col("url")).persist()
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
    p = fetched.withColumn(
        "p", udfs.parse_page(F.col("html"), F.col("fetch_url"),
                             F.col("host"), F.lit("https"),
                             F.col("redirect_to")))
    out = p.select("host", F.col("fetch_url").alias("url"),
                   F.col("p.links").alias("links"),
                   F.col("p.title").alias("title"),
                   F.col("p.text").alias("text"))
    tmp = tempfile.mkdtemp(prefix="iso_out_")
    t_mark = time.time()
    out.write.mode("overwrite").parquet(os.path.join(tmp, "b"))
    wall = time.time() - t_mark
    print(f"{master} write wall: {wall:.2f}s")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    stages = {}
    files = [q for q in glob.glob(os.path.join(evdir, "*", "*"))
             if os.path.isfile(q) and "appstatus" not in q]
    files += [q for q in glob.glob(os.path.join(evdir, "*"))
              if os.path.isfile(q)]
    for f in files:
        for line in open(f):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                dd = stages.setdefault(sid, {})
                dd.update(name=si["Stage Name"].split()[0],
                          tasks=si["Number of Tasks"],
                          wall=round((comp - sub) / 1000, 2)
                          if sub and comp else None, sub=sub)
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                dd = stages.setdefault(sid, {})
                dd["run"] = dd.get("run", 0) + (m.get("Executor Run Time") or 0)
                dd["cpu"] = (dd.get("cpu", 0)
                             + (m.get("Executor CPU Time") or 0) // 1_000_000)
                dd["maxtask"] = max(dd.get("maxtask", 0),
                                    m.get("Executor Run Time") or 0)
                dd["n_ended"] = dd.get("n_ended", 0) + 1
    subbed = [s["sub"] for s in stages.values() if s.get("sub")]
    t0 = min(subbed) if subbed else 0
    for sid in sorted(stages):
        s = stages[sid]
        off = round((s.get("sub", t0) - t0) / 1000, 1)
        print(f"stage {sid:3} {s.get('name', '?'):14} "
              f"tasks={s.get('tasks', '?')!s:>4} t+{off:>7} "
              f"wall={s.get('wall')!s:>7} sumRun={s.get('run', 0)/1000:7.1f}s "
              f"sumCpu={s.get('cpu', 0)/1000:7.1f}s "
              f"maxTask={s.get('maxtask', 0)/1000:6.1f}s")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[16]")
