"""Skewed-host crawl bench (VERDICT r3 #7): prove the salted politeness
window holds wall-time under real-web host skew.

Runs the SAME crawl workload at the same page count on (a) the uniform
64-host fixture and (b) a Zipf(s=1.2) long-tail fixture (top host ≈ 40%
of pages), interleaved N× so both sample the same host-noise window, one
fresh JVM per run.  Reports per-variant best wall and the zipf/uniform
ratio — the claim is ratio ≤ ~1.2 at equal pages.

Usage: python tools/bench_skew.py [n_pages] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r'''
import json, sys, time
sys.path.insert(0, "{repo}")
from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
import bench
cpus = int(sys.argv[1]); n = int(sys.argv[2])
zipf = float(sys.argv[3]) if sys.argv[3] != "none" else None
spark = build_session(app_name=f"skew{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus)
bench.crawl_workload(spark, 2000)  # warm JVM/codegen/python workers
web, robots, seeds = bench.setup_crawl(spark, n, zipf_s=zipf)
t0 = time.perf_counter()
fetched, scheduled = bench.run_crawl_workload(spark, web, robots, seeds)
dt = time.perf_counter() - t0
print(json.dumps({{"sec": round(dt, 2), "fetched": fetched,
                   "pps": round(fetched / dt, 1)}}))
spark.stop()
'''


def run_one(cpus: int, n_pages: int, zipf: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO)),
         str(cpus), str(n_pages), zipf],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:] + "\n")
        raise RuntimeError("child produced no result")
    return json.loads(lines[-1])


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = 8
    best: dict[str, dict] = {}
    for _ in range(reps):
        for variant in ("none", "1.2"):  # interleaved
            r = run_one(cpus, n_pages, variant)
            k = "uniform" if variant == "none" else "zipf"
            if k not in best or r["sec"] < best[k]["sec"]:
                best[k] = r
            print(json.dumps({"variant": k, **r}), flush=True)
    ratio = best["zipf"]["sec"] / best["uniform"]["sec"]
    print(json.dumps({
        "n_pages": n_pages, "cpus": cpus,
        "uniform_sec": best["uniform"]["sec"],
        "zipf_sec": best["zipf"]["sec"],
        "uniform_fetched": best["uniform"]["fetched"],
        "zipf_fetched": best["zipf"]["fetched"],
        "wall_ratio_zipf_over_uniform": round(ratio, 3),
        "holds_1_2x": ratio <= 1.2,
    }))


if __name__ == "__main__":
    main()
