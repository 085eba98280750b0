"""Event-log breakdown of a full wide crawl-loop run.

Usage: python scripts/ev_loop_breakdown.py 'local[16]' [n_hosts]
Runs run_crawl_wide with an uncompressed event log and prints per-job
wall / task-time / CPU-time / GC / spill / python-boundary sums, grouped
so the repeated leaf-round jobs are comparable across parallelism levels.
"""
import glob
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(master, n_hosts):
    evdir = tempfile.mkdtemp(prefix="evloop_")
    os.environ["DISCO_SPARK_EXTRA"] = json.dumps({
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": evdir,
    })
    import bench
    res = bench.run_crawl_wide(master, n_hosts, max_rounds=10)
    print(f"{master} {res}")

    jobs = {}          # job id -> {sub, comp, stages: set}
    stage_job = {}
    stages = {}
    files = [q for q in glob.glob(os.path.join(evdir, "*"))
             if os.path.isfile(q)]
    files += [q for q in glob.glob(os.path.join(evdir, "*", "*"))
              if os.path.isfile(q) and "appstatus" not in q]
    for f in files:
        for line in open(f):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                jobs[jid] = {"sub": e["Submission Time"], "stages": []}
                for si in e.get("Stage Infos", []):
                    stage_job[si["Stage ID"]] = jid
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["comp"] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                dd = stages.setdefault(sid, dict(run=0, cpu=0, gc=0,
                                                 spill=0, tasks=0))
                dd["run"] += m.get("Executor Run Time") or 0
                dd["cpu"] += (m.get("Executor CPU Time") or 0) // 1_000_000
                dd["gc"] += m.get("JVM GC Time") or 0
                dd["spill"] += m.get("Disk Bytes Spilled") or 0
                dd["tasks"] += 1
    rows = []
    for jid, j in sorted(jobs.items()):
        if "comp" not in j:
            continue
        wall = (j["comp"] - j["sub"]) / 1000
        agg = dict(run=0, cpu=0, gc=0, spill=0, tasks=0)
        for sid, sj in stage_job.items():
            if sj == jid and sid in stages:
                for k in agg:
                    agg[k] += stages[sid][k]
        rows.append((jid, wall, agg))
    print(f"{'job':>4} {'wall':>7} {'tasks':>6} {'sumRun':>8} "
          f"{'sumCpu':>8} {'gc':>6} {'spillMB':>8}")
    for jid, wall, a in rows:
        print(f"{jid:>4} {wall:7.2f} {a['tasks']:>6} {a['run']/1000:8.1f} "
              f"{a['cpu']/1000:8.1f} {a['gc']/1000:6.1f} "
              f"{a['spill']/1e6:8.1f}")
    big = sorted(rows, key=lambda r: -r[1])[:8]
    print("slowest jobs:", [(j, round(w, 1)) for j, w, _ in big])
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[16]",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1000)
