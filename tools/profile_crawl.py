"""Per-action profiler for the crawl round loop (scaling diagnosis).

Replays bench.crawl_workload's crawl with a timer around every driver
action so we can see which fixed costs fail to scale from local[8] to
local[32].

Usage: python tools/profile_crawl.py <cpus> <n_pages>
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import (
    CrawlConfig,
    dedupe_seed_jobs,
    run_round,
    seeds_to_frontier,
    _empty,
    SEEN_SCHEMA,
)
from distributed_web_crawling_and_indexing_system_gcp_spark.operators import seen as seen_ops
from distributed_web_crawling_and_indexing_system_gcp_spark.sources import webgen

from pyspark.sql import functions as F

TIMES: dict[str, float] = defaultdict(float)


def timed(name):
    class _C:
        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            TIMES[name] += time.perf_counter() - self.t0

    return _C()


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    spark = build_session(
        app_name=f"profile{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    n_hosts = 64
    with timed("webgen"):
        web = webgen.make_web_pages(spark, n_pages, n_hosts, 8).persist()
        web.count()
    robots_src = webgen.make_robots_src(spark, n_hosts)
    seeds = spark.createDataFrame(
        [("bench-job", [webgen.url_of(i, n_hosts) for i in range(0, n_pages, 8)], 2, None)],
        "task_id string, seed_urls array<string>, depth int, domain_restriction string",
    )
    cfg = CrawlConfig(
        max_depth=2, politeness_budget=4000, salt_buckets=8,
        bloom_shards=32, bloom_bits_per_shard=1 << 20, max_rounds=5,
    )

    t_all = time.perf_counter()
    jobs = dedupe_seed_jobs(seeds)
    frontier = seeds_to_frontier(spark, jobs).localCheckpoint()
    seen = _empty(spark, SEEN_SCHEMA)
    robots_rules = _empty(spark, "host string, rules_txt string")
    documents = None
    bloom = None
    retryable = (F.col("status") == "pending") | (
        (F.col("status") == "timeout") & (F.col("attempts") < cfg.max_attempts)
    )
    fetched_total = 0
    for round_no in range(cfg.max_rounds):
        r0 = time.perf_counter()
        with timed(f"r{round_no}:pending_check"):
            if frontier.filter(retryable).limit(1).count() == 0:
                break
        if bloom is None:
            with timed(f"r{round_no}:bloom_full_build"):
                shards_df = seen_ops.build_bloom_shards(
                    seen, cfg.bloom_shards, cfg.bloom_bits_per_shard
                )
                bloom = seen_ops.shards_to_dict(shards_df)
        out = run_round(
            spark, round_no, frontier, seen, robots_rules, web, robots_src, cfg, bloom
        )
        nb = spark.sparkContext.defaultParallelism
        from pyspark.storagelevel import StorageLevel
        _ck = {"eager": True, "storageLevel": StorageLevel.DISK_ONLY}
        with timed(f"r{round_no}:ckpt_frontier"):
            frontier = out["frontier"].repartition(nb, "url_hash").localCheckpoint(**_ck)
        with timed(f"r{round_no}:ckpt_seen"):
            seen = seen.unionByName(out["seen_delta"].localCheckpoint(**_ck))
            if (round_no + 1) % 8 == 0:
                seen = seen.repartition(nb, "url_hash").localCheckpoint(**_ck)
        with timed(f"r{round_no}:ckpt_robots"):
            robots_rules = out["robots"].coalesce(1).localCheckpoint(**_ck)
        with timed(f"r{round_no}:ckpt_documents"):
            d = out["documents"].coalesce(nb).localCheckpoint(**_ck)
            documents = d if documents is None else documents.unionByName(d)
        with timed(f"r{round_no}:ckpt_metrics"):
            out["metrics"].coalesce(nb).localCheckpoint(**_ck)
        with timed(f"r{round_no}:bloom_delta"):
            import numpy as np
            keys = np.array([r[0] for r in out["seen_delta"].select("url_hash").collect()],
                            dtype=np.int64)
            bloom = seen_ops.bloom_insert_driver(
                bloom, keys, cfg.bloom_shards, cfg.bloom_bits_per_shard
            )
        for df in out.get("_persisted", []):
            df.unpersist()
        TIMES[f"r{round_no}:TOTAL"] = time.perf_counter() - r0
    with timed("final_fetch_count"):
        fetched_total = frontier.filter("status = 'fetched'").count()
    total = time.perf_counter() - t_all
    print(json.dumps({"cpus": cpus, "n_pages": n_pages, "fetched": fetched_total,
                      "total_sec": round(total, 2)}))
    for k in sorted(TIMES):
        print(f"  {k:32s} {TIMES[k]:8.2f}s")


if __name__ == "__main__":
    main()
