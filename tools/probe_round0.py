"""Fine-grained round-0 stage probe: where does time go at each core count?

Usage: python tools/probe_round0.py <cpus> <n_pages>
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session
from distributed_web_crawling_and_indexing_system_gcp_spark.plans import crawl as C
from distributed_web_crawling_and_indexing_system_gcp_spark.operators import politeness
from distributed_web_crawling_and_indexing_system_gcp_spark.functions.html import parse_html_udf
from distributed_web_crawling_and_indexing_system_gcp_spark.sources.fetch import (
    classify_fetch,
    fetch_synthetic,
)
from distributed_web_crawling_and_indexing_system_gcp_spark.sources import webgen
from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"  {label:36s} {time.perf_counter()-t0:8.2f}s  -> {r}")
    return r


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    spark = build_session(app_name=f"probe{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    n_hosts = 64
    web = webgen.make_web_pages(spark, n_pages, n_hosts, 8).persist()
    t("webgen persist", web.count)
    seeds = spark.createDataFrame(
        [("bench-job", [webgen.url_of(i, n_hosts) for i in range(0, n_pages, 8)], 2, None)],
        "task_id string, seed_urls array<string>, depth int, domain_restriction string",
    )
    frontier = C.seeds_to_frontier(spark, C.dedupe_seed_jobs(seeds))
    t("seeds_to_frontier count", frontier.count)
    print("  frontier partitions:", frontier.rdd.getNumPartitions())
    frontier = frontier.localCheckpoint()
    t("frontier localCheckpoint count", frontier.count)

    windowed = politeness.select_polite_batch(
        frontier, budget=4000, salt_buckets=8, order_cols=("depth", "url", "task_id")
    ).persist()
    t("politeness window", windowed.count)
    batch = windowed.filter(F.col("selected")).drop("selected").persist()
    t("batch persist", batch.count)
    print("  batch partitions:", batch.rdd.getNumPartitions())

    fetched = classify_fetch(fetch_synthetic(batch, web)).persist()
    t("fetch join + classify", fetched.count)
    print("  fetched partitions:", fetched.rdd.getNumPartitions())

    ok_html = fetched.filter(F.col("fetch_outcome") == "ok_html").withColumn(
        "spans", parse_html_udf(F.col("html"))
    ).persist()
    t("parse_html", ok_html.count)

    cfg = C.CrawlConfig(max_depth=2, politeness_budget=4000, salt_buckets=8)
    cand = C._extract_links(ok_html, cfg).persist()
    t("extract_links (resolve+canon)", cand.count)

    dd = cand.dropDuplicates(["url_hash"])
    t("dedup children", dd.count)
    spark.stop()


if __name__ == "__main__":
    main()
