"""Profile one crawl-workload run with the Spark event log enabled, then
summarize it with tools/analyze_eventlog.py.

Usage: python tools/profile_crawl.py <cpus> <n_pages> [label]

Prints the bench numbers plus the event-log breakdown (stage wall by
name, GC totals, driver-only gaps) — the evidence base for the scaling
work (VERDICT r2 item 1).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    label = sys.argv[3] if len(sys.argv) > 3 else f"c{cpus}p{n_pages}"
    # seed_every=1 → the production shape (every page seeded up front,
    # few giant rounds) the scaling pairs measure
    seed_every = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    evdir = f"/tmp/spark-events-{label}"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(f"{evdir}/*"):
        os.remove(f)

    from distributed_web_crawling_and_indexing_system_gcp_spark.session import (
        build_session,
    )
    import bench

    spark = build_session(
        app_name=f"profile-{label}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    # warm JVM/codegen/Python workers like bench_scaling does
    bench.crawl_workload(spark, 2000)
    web, robots, seeds = bench.setup_crawl(spark, n_pages, seed_every=seed_every)
    cutoff_ms = int(time.time() * 1000)
    t0 = time.perf_counter()
    fetched, scheduled = bench.run_crawl_workload(spark, web, robots, seeds)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "label": label, "cpus": cpus, "n_pages": n_pages,
        "sec": round(dt, 2), "fetched": fetched, "scheduled": scheduled,
        "pages_per_sec": round(fetched / dt, 1),
    }))
    spark.stop()
    time.sleep(2)

    import subprocess
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "analyze_eventlog.py"),
         f"{evdir}/*", str(cutoff_ms)],
    )


if __name__ == "__main__":
    main()
