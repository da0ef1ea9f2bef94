"""spark-submit entrypoint.

Run the crawl (synthetic closed world or externally provided parquet
fixtures) on any Spark master:

    spark-submit --py-files pyspark_frontier.zip \
        -m ... cli.py crawl --pages 200000 --depth 2 --budget 4000 \
        --snapshot-dir /tmp/crawl_run [--resume]

    python -m distributed_web_crawling_and_indexing_system_gcp_spark.cli \
        crawl --pages 20000            # local mode

Subcommands:
  crawl   — run the round loop; prints per-round + final stats as JSON
  bench   — the crawl throughput workload only (pages/s line)

External fixtures: pass --web-pages/--robots/--seeds parquet paths with
the schemas from FIXTURES.md §2-4 to crawl a custom closed world.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p):
    p.add_argument("--master", default=None, help="spark master (default env/local[*])")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--pages", type=int, default=20_000)
    p.add_argument("--hosts", type=int, default=64)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--budget", type=int, default=4000)
    p.add_argument("--salt-buckets", type=int, default=8)
    p.add_argument("--bloom-shards", type=int, default=32)
    p.add_argument("--bloom-bits", type=int, default=1 << 20)
    p.add_argument("--max-rounds", type=int, default=16)
    p.add_argument("--web-pages", default=None, help="parquet path (FIXTURES.md §3)")
    p.add_argument("--robots", default=None, help="parquet path (FIXTURES.md §4)")
    p.add_argument("--seeds", default=None, help="parquet path (FIXTURES.md §2)")
    p.add_argument("--snapshot-dir", default=None)
    p.add_argument("--resume", action="store_true")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pyspark-frontier")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_common(sub.add_parser("crawl"))
    _add_common(sub.add_parser("bench"))
    args = ap.parse_args(argv)

    from .plans.crawl import CrawlConfig, run_crawl
    from .session import build_session
    from .sources import webgen
    from .sources.snapshots import SnapshotStore

    spark = build_session(
        app_name=f"frontier-{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    if args.web_pages:
        web = spark.read.parquet(args.web_pages)
    else:
        web = webgen.make_web_pages(spark, args.pages, args.hosts)
    robots = (
        spark.read.parquet(args.robots)
        if args.robots
        else webgen.make_robots_src(spark, args.hosts)
    )
    if args.seeds:
        seeds = spark.read.parquet(args.seeds)
    else:
        seed_urls = [webgen.url_of(i, args.hosts) for i in range(0, args.pages, 8)]
        seeds = spark.createDataFrame(
            [("cli-job", seed_urls, args.depth, None)],
            "task_id string, seed_urls array<string>, depth int, "
            "domain_restriction string",
        )

    cfg = CrawlConfig(
        max_depth=args.depth,
        politeness_budget=args.budget,
        salt_buckets=args.salt_buckets,
        bloom_shards=args.bloom_shards,
        bloom_bits_per_shard=args.bloom_bits,
        max_rounds=args.max_rounds,
    )
    store = SnapshotStore(args.snapshot_dir, spark) if args.snapshot_dir else None

    t0 = time.perf_counter()
    out = run_crawl(spark, seeds, web, robots, cfg, store=store, resume=args.resume)
    fetched = out["frontier"].filter("status = 'fetched'").count()
    total = out["frontier"].count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "cmd": args.cmd,
                "pages_fetched": fetched,
                "frontier_rows": total,
                "documents": out["documents"].count(),
                "seen": out["seen"].count(),
                "sec": round(dt, 2),
                "pages_per_sec": round(fetched / dt, 1),
                "rounds": (store.current_round() + 1) if store else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
