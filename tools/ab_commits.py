"""Interleaved A/B of the SAME crawl workload across two checkouts.

Adjudicates code-vs-host when bench numbers move between rounds: runs
bench.run_crawl_workload in fresh child JVMs, alternating checkout A and
checkout B inside the same host-noise window (this VM has multi-minute
~2-4x degradation episodes, so unpaired samples across hours are
meaningless).  Each child also reports a single-core burn so the window
quality is on the record.

Usage: python tools/ab_commits.py <cpus> <n_pages> <rounds> nameA=/path/a nameB=/path/b
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

CHILD = r"""
import json, sys, time
repo = sys.argv[1]; cpus = int(sys.argv[2]); n_pages = int(sys.argv[3])
sys.path.insert(0, repo)
from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
import bench

def burn():
    t0 = time.perf_counter(); s = 0
    for i in range(10_000_000): s += i * i
    return round(time.perf_counter() - t0, 3)

b0 = burn()
spark = build_session(app_name=f"ab{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
bench.crawl_workload(spark, 2000)
web, robots, seeds = bench.setup_crawl(spark, n_pages)
t0 = time.perf_counter()
fetched, scheduled = bench.run_crawl_workload(spark, web, robots, seeds)
dt = time.perf_counter() - t0
print(json.dumps({"fetched": fetched, "sec": round(dt, 2),
                  "pps": round(fetched / dt, 1), "burn_pre": b0,
                  "burn_post": burn()}))
spark.stop()
"""


def run_one(repo: str, cpus: int, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo, str(cpus), str(n_pages)],
        capture_output=True, text=True, cwd=repo, timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
        raise RuntimeError(f"child in {repo} produced no result")
    return json.loads(lines[-1])


def main():
    cpus, n_pages, rounds = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    variants = [a.split("=", 1) for a in sys.argv[4:]]
    res: dict[str, list[dict]] = {name: [] for name, _ in variants}
    for rnd in range(rounds):
        # rotate the execution order each round: a fixed order correlates
        # each variant with a fixed position inside the host-noise window
        # (a slow ramp poisons whichever variant always runs first)
        order = variants[rnd % len(variants):] + variants[:rnd % len(variants)]
        for name, path in order:
            r = run_one(path, cpus, n_pages)
            res[name].append(r)
            print(json.dumps({"round": rnd, "variant": name, **r}), flush=True)
    summary = {}
    for name, runs in res.items():
        secs = [r["sec"] for r in runs]
        summary[name] = {"best_sec": min(secs), "median_sec": statistics.median(secs),
                         "all_sec": secs}
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
