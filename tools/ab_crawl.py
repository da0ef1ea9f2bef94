"""Interleaved A/B runner for crawl-loop experiments.

This sandbox VM has multi-minute episodes of ~4x multi-core slowdown, so
single measurements are meaningless; variants must be interleaved inside
the same noise window and compared on best-of (and median-of) reps.

Usage:
    python tools/ab_crawl.py <cpus> <n_pages> <reps> name1=extra_json1 name2=extra_json2 ...

Each variant runs in a fresh child JVM; variants alternate A B A B ...
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time, os
sys.path.insert(0, {repo!r})
from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
import bench
cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = build_session(app_name=f"ab{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
bench.crawl_workload(spark, 2000)
web, robots, seeds = bench.setup_crawl(spark, n_pages)
t0 = time.perf_counter()
fetched, scheduled = bench.run_crawl_workload(spark, web, robots, seeds)
dt = time.perf_counter() - t0
print(json.dumps({{"fetched": fetched, "scheduled": scheduled, "sec": round(dt, 2),
                  "pages_per_sec": round(fetched/dt, 1)}}))
spark.stop()
"""


def run_one(cpus: int, n_pages: int, extra: str) -> dict:
    env = dict(**__import__("os").environ, SPARK_GRAFT_CRAWL_EXTRA=extra)
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO)),
         str(cpus), str(n_pages)],
        capture_output=True, text=True, cwd=str(REPO), env=env, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
        raise RuntimeError("child produced no result")
    return json.loads(lines[-1])


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    reps = int(sys.argv[3])
    variants = [a.split("=", 1) for a in sys.argv[4:]]
    results: dict[str, list[float]] = {name: [] for name, _ in variants}
    for rep in range(reps):
        for name, extra in variants:
            r = run_one(cpus, n_pages, extra)
            results[name].append(r["sec"])
            print(json.dumps({"rep": rep, "variant": name, **r}), flush=True)
    for name, secs in results.items():
        print(json.dumps({
            "variant": name, "best": min(secs),
            "median": round(statistics.median(secs), 2), "all": secs,
        }))


if __name__ == "__main__":
    main()
