"""Summarize a Spark event log: job/stage counts, stage-time by name,
driver-only gaps, task-time totals.  Usage:
    python tools/analyze_eventlog.py /tmp/spark-events/local-*
"""
from __future__ import annotations

import collections
import glob
import json
import sys


def main():
    import os

    path = sorted(glob.glob(sys.argv[1]))[-1]
    # optional: only count events at/after this epoch-ms (excludes warmup);
    # a NEGATIVE value means "only the last N seconds of the log"
    after = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if os.path.isdir(path):  # eventlog v2 rolling dir
        files = sorted(
            f for f in glob.glob(f"{path}/events_*") if os.path.isfile(f)
        )
    else:
        files = [path]

    def _lines():
        import subprocess

        for f in files:
            if f.endswith(".zstd"):
                out = subprocess.run(["unzstd", "-c", f], capture_output=True,
                                     text=True)
                yield from out.stdout.splitlines()
            else:
                with open(f) as fh:
                    yield from fh
    stages = {}
    jobs = []
    task_time = collections.Counter()
    gc_time = collections.Counter()
    cpu_time = collections.Counter()
    ser_time = collections.Counter()
    fetch_wait = collections.Counter()
    write_time = collections.Counter()
    if after < 0:
        tmax0 = 0
        for line in _lines():
            if '"SparkListenerJobEnd"' not in line:
                continue
            try:
                e = json.loads(line)
            except Exception:
                continue
            tmax0 = max(tmax0, e.get("Completion Time", 0))
        after = tmax0 + after * 1000

    for line in _lines():
        try:
            e = json.loads(line)
        except Exception:
            continue
        t = e.get("Event")
        if t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and sub < after:
                continue
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split(" at ")[0],
                "dur": (comp - sub) / 1000 if sub and comp else 0,
                "tasks": si["Number of Tasks"],
                "sub": sub,
                "comp": comp,
            }
        elif t == "SparkListenerJobStart":
            if e["Submission Time"] < after:
                continue
            jobs.append({"id": e["Job ID"], "t0": e["Submission Time"]})
        elif t == "SparkListenerJobEnd":
            for j in jobs:
                if j["id"] == e["Job ID"]:
                    j["t1"] = e["Completion Time"]
        elif t == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            sid = e["Stage ID"]
            task_time[sid] += m.get("Executor Run Time", 0)
            gc_time[sid] += m.get("JVM GC Time", 0)
            cpu_time[sid] += m.get("Executor CPU Time", 0) / 1e6  # ns->ms
            ser_time[sid] += m.get("Executor Deserialize Time", 0)
            srm = m.get("Shuffle Read Metrics") or {}
            fetch_wait[sid] += srm.get("Fetch Wait Time", 0)
            swm = m.get("Shuffle Write Metrics") or {}
            write_time[sid] += swm.get("Shuffle Write Time", 0) / 1e6
    tmin = min(j["t0"] for j in jobs)
    tmax = max(j.get("t1", j["t0"]) for j in jobs)
    print(f"jobs={len(jobs)} stages={len(stages)} wall={(tmax-tmin)/1000:.0f}s")
    byname = collections.Counter()
    cnt = collections.Counter()
    tasks = collections.Counter()
    run = collections.Counter()
    for sid, s in stages.items():
        byname[s["name"]] += s["dur"]
        cnt[s["name"]] += 1
        tasks[s["name"]] += s["tasks"]
        run[s["name"]] += task_time[sid] / 1000
    print("stage wall-time by name (task-run-time):")
    for n, d in byname.most_common(16):
        print(f"  {d:8.1f}s (run {run[n]:7.1f}s) x{cnt[n]:4d} stages {tasks[n]:6d} tasks  {n}")
    def _tot(c):  # only stages inside the analyzed (post-`after`) window
        return sum(v for k, v in c.items() if k in stages) / 1000

    print(f"total gc: {_tot(gc_time):.1f}s  "
          f"run: {_tot(task_time):.1f}s  "
          f"cpu: {_tot(cpu_time):.1f}s  "
          f"deser: {_tot(ser_time):.1f}s  "
          f"fetchwait: {_tot(fetch_wait):.1f}s  "
          f"shufwrite: {_tot(write_time):.1f}s")
    iv = sorted((s["sub"], s["comp"]) for s in stages.values() if s["sub"])
    cov = 0
    cur = None
    for a, b in iv:
        if cur is None or a > cur[1]:
            if cur:
                cov += cur[1] - cur[0]
            cur = [a, b]
        else:
            cur[1] = max(cur[1], b)
    if cur:
        cov += cur[1] - cur[0]
    print(f"covered by running stages: {cov/1000:.0f}s; driver-only gaps: {(tmax-tmin-cov)/1000:.0f}s")
    top = sorted(stages.items(), key=lambda kv: -kv[1]["dur"])[:10]
    print("longest stages:")
    for sid, s in top:
        print(f"  stage {sid:4d} {s['dur']:7.1f}s {s['tasks']:5d} tasks run={task_time[sid]/1000:6.1f}s gc={gc_time[sid]/1000:5.1f}s  {s['name']}")


if __name__ == "__main__":
    main()
