"""Round-6 optimization measurement harness (guide §1.4).

NOT the driver bench — bench.py stays frozen.  This script isolates each
declared query with the noop sink so the timed number is the computation,
not the sink or the count() column pruning, and can restrict to a subset:

    python bench_extra.py [query ...]           # noop-timed queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py dedup_minhash_lsh

Prints one JSON line {"queries": {name: sec}, "sf": ..., "mode": "noop"}.
Each query is labeled via setJobDescription for event-log attribution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "1"))

    from distributed_web_crawling_and_indexing_system_gcp_spark.session import (
        build_session,
    )
    import __spark_entry__ as E

    spark = build_session(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = {**E.queries(), **E.extra_queries()}
    names = sys.argv[1:] or [
        n for n in qs if n not in ("crawl_round", "crawl_round_summary")
    ]
    # warm the JVM / parquet footers like bench.py does
    qs["pricing_summary"](spark, sf_dir).count()
    qs["postings"](spark, sf_dir).count()
    if any(n in names for n in ("search_partitioned",)):
        qs["search_partitioned"](spark, sf_dir).count()
    if any(n in names for n in ("search_bm25", "search_multifield")):
        qs["search_bm25"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings, "sf": sf, "mode": "noop",
                      "cpus": cpus, "repeats": repeats}))
    spark.stop()


if __name__ == "__main__":
    main()
