"""Serial-fraction audit of the crawl round loop (north-rule work).

Runs the production-shaped crawl (seed_every=1) at local[2] and local[8]
in fresh child JVMs with the opt-in ``phase_log`` instrumentation in
``plans/crawl.py``, then prints, per phase:

- wall at each level,
- the Amdahl-implied serial component  s = (4·T8 − T2)/3  (a phase that
  is pure parallel work has s≈0; a phase that is pure driver latency has
  s≈T2≈T8),

so the phases that cap scaling efficiency are named, not guessed.

Usage: python tools/profile_serial.py [n_pages] [cpus_lo] [cpus_hi]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import CrawlConfig, run_crawl
import bench

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2])
import os as _os
_conf = json.loads(_os.environ.get("SPARK_PROF_CONF", "{{}}"))
spark = build_session(app_name=f"prof{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus, extra_conf=_conf)
bench.crawl_workload(spark, 2000)  # warm JVM/codegen/UDF workers
web, robots, seeds = bench.setup_crawl(spark, n_pages, seed_every=1)

phase_log = []
cfg = CrawlConfig(max_depth=1, politeness_budget=32_000, salt_buckets=8,
                  bloom_shards=32, bloom_bits_per_shard=1 << 20, max_rounds=3,
                  extra={{"phase_log": phase_log}})
t0 = time.perf_counter()
out = run_crawl(spark, seeds, web, robots, cfg)
from pyspark.sql import functions as F
row = out["frontier"].agg(
    F.count("*").alias("scheduled"),
    F.count(F.when(F.col("status") == "fetched", 1)).alias("fetched"),
).collect()[0]
total = time.perf_counter() - t0
per_phase = {{}}
for rnd, name, dt in phase_log:
    per_phase[name] = per_phase.get(name, 0.0) + dt
print(json.dumps({{"cpus": cpus, "total": round(total, 2),
                  "fetched": row["fetched"],
                  "phases": {{k: round(v, 2) for k, v in per_phase.items()}},
                  "by_round": [(r, n, round(d, 2)) for r, n, d in phase_log]}}))
spark.stop()
"""


def run_at(cpus: int, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=str(REPO)), str(cpus), str(n_pages)],
        capture_output=True, text=True, cwd=str(REPO), timeout=3600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-3000:] + "\n")
        raise RuntimeError(f"child cpus={cpus} failed")
    return json.loads(lines[-1])


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    r_lo = run_at(lo, n_pages)
    r_hi = run_at(hi, n_pages)
    ratio = hi / lo
    phases = sorted(set(r_lo["phases"]) | set(r_hi["phases"]))
    print(f"\n== {n_pages} pages, local[{lo}] vs local[{hi}] ==")
    print(f"total: {r_lo['total']} s vs {r_hi['total']} s  "
          f"(eff {r_lo['total'] / (ratio * r_hi['total']):.3f})")
    print(f"{'phase':24s} {'T'+str(lo):>8s} {'T'+str(hi):>8s} {'serial_s':>9s}")
    tot_s = 0.0
    for p in phases:
        t_lo = r_lo["phases"].get(p, 0.0)
        t_hi = r_hi["phases"].get(p, 0.0)
        s = max((ratio * t_hi - t_lo) / (ratio - 1.0), 0.0)
        tot_s += s
        print(f"{p:24s} {t_lo:8.2f} {t_hi:8.2f} {s:9.2f}")
    un_lo = r_lo["total"] - sum(r_lo["phases"].values())
    un_hi = r_hi["total"] - sum(r_hi["phases"].values())
    s_un = max((ratio * un_hi - un_lo) / (ratio - 1.0), 0.0)
    print(f"{'(unattributed)':24s} {un_lo:8.2f} {un_hi:8.2f} {s_un:9.2f}")
    print(f"implied serial total ≈ {tot_s + s_un:.1f} s")
    print(json.dumps({"lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
