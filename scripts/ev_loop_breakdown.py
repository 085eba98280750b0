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
                    stages.setdefault(si["Stage ID"], {}).setdefault(
                        "name", si.get("Stage Name", "?"))
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["comp"] = e["Completion Time"]
            elif ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                d = stages.setdefault(si["Stage ID"], {})
                d["ssub"] = si.get("Submission Time")
                d["name"] = si.get("Stage Name", "?")
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                d = stages.setdefault(si["Stage ID"], {})
                d["scomp"] = si.get("Completion Time")
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                dd = stages.setdefault(sid, {})
                for k in ("run", "cpu", "gc", "spill", "tasks", "maxrun",
                          "inMB", "outMB"):
                    dd.setdefault(k, 0)
                r = m.get("Executor Run Time") or 0
                dd["run"] += r
                dd["maxrun"] = max(dd["maxrun"], r)
                dd["cpu"] += (m.get("Executor CPU Time") or 0) // 1_000_000
                dd["gc"] += m.get("JVM GC Time") or 0
                dd["spill"] += m.get("Disk Bytes Spilled") or 0
                dd["inMB"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0) / 1e6
                dd["outMB"] += (m.get("Output Metrics") or {}).get(
                    "Bytes Written", 0) / 1e6
                dd["tasks"] += 1
    rows = []
    for jid, j in sorted(jobs.items()):
        if "comp" not in j:
            continue
        wall = (j["comp"] - j["sub"]) / 1000
        agg = dict(run=0, cpu=0, gc=0, spill=0, tasks=0, inMB=0, outMB=0)
        for sid, sj in stage_job.items():
            if sj == jid and sid in stages and "tasks" in stages[sid]:
                for k in agg:
                    agg[k] += stages[sid][k]
        rows.append((jid, wall, agg))
    print(f"{'job':>4} {'wall':>7} {'tasks':>6} {'sumRun':>8} "
          f"{'sumCpu':>8} {'gc':>6} {'spillMB':>8} {'inMB':>7} {'outMB':>7}")
    for jid, wall, a in rows:
        print(f"{jid:>4} {wall:7.2f} {a['tasks']:>6} {a['run']/1000:8.1f} "
              f"{a['cpu']/1000:8.1f} {a['gc']/1000:6.1f} "
              f"{a['spill']/1e6:8.1f} {a['inMB']:7.0f} {a['outMB']:7.0f}")
    big = sorted(rows, key=lambda r: -r[1])[:8]
    print("slowest jobs:", [(j, round(w, 1)) for j, w, _ in big])
    # per-stage detail for the slowest jobs: where inside the big
    # per-round job the wall actually goes (stage wall from the stage
    # submitted/completed events; maxrun exposes stragglers)
    for jid, wall, _ in sorted(big, key=lambda r: r[0]):
        print(f"-- job {jid} (wall {wall:.1f}s) stages:")
        for sid in sorted(s for s, j2 in stage_job.items() if j2 == jid):
            d = stages.get(sid) or {}
            if "tasks" not in d:
                continue
            swall = ((d.get("scomp") or 0) - (d.get("ssub") or 0)) / 1000
            print(f"   s{sid} wall={swall:6.2f} tasks={d['tasks']:>4} "
                  f"run={d['run']/1000:7.1f} cpu={d['cpu']/1000:7.1f} "
                  f"maxrun={d['maxrun']/1000:6.2f} "
                  f"in={d['inMB']:6.0f}MB out={d['outMB']:6.0f}MB "
                  f"| {d.get('name', '?')[:60]}")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "local[16]",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1000)
