"""Checkpoint/resume (north rule T7): a run killed after round k and
resumed from the snapshot store produces bit-identical final tables vs an
uninterrupted run; half-written (uncommitted) data is invisible."""

from __future__ import annotations

import json
import os

import pytest

from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import (
    CrawlConfig,
    run_crawl,
)
from distributed_web_crawling_and_indexing_system_gcp_spark.sources.snapshots import (
    SnapshotStore,
)

CFG = CrawlConfig(
    max_depth=2,
    politeness_budget=5,
    salt_buckets=4,
    bloom_shards=8,
    bloom_bits_per_shard=1 << 16,
    max_rounds=16,
)


def _tables_signature(out):
    frontier = sorted(
        map(tuple, out["frontier"].select(
            "canonical_url", "task_id", "depth", "status", "attempts",
            "round_added", "round_processed",
        ).collect())
    )
    seen = sorted(r["url"] for r in out["seen"].collect())
    docs = sorted(
        (r["canonical_url"], r["round"], str(r["spans"]))
        for r in out["documents"].collect()
    )
    return frontier, seen, docs


def test_resume_bit_identical(spark, web_fixture, tmp_path_factory):
    full_root = str(tmp_path_factory.mktemp("full"))
    part_root = str(tmp_path_factory.mktemp("part"))

    full_store = SnapshotStore(full_root, spark)
    full = run_crawl(
        spark, web_fixture["seed_jobs"], web_fixture["web_pages"],
        web_fixture["robots_src"], CFG, store=full_store,
    )
    n_rounds = full_store.current_round() + 1
    assert n_rounds >= 3

    # interrupted run: stop after round 1 by capping max_rounds
    cfg_cut = CrawlConfig(**{**CFG.__dict__, "max_rounds": 2})
    part_store = SnapshotStore(part_root, spark)
    run_crawl(
        spark, web_fixture["seed_jobs"], web_fixture["web_pages"],
        web_fixture["robots_src"], cfg_cut, store=part_store,
    )
    assert part_store.current_round() == 1

    # simulate a crash mid-round-2: half-written data, no commit record
    os.makedirs(os.path.join(part_root, "frontier", "r2"), exist_ok=True)
    with open(os.path.join(part_root, "frontier", "r2", "garbage.parquet"), "w") as f:
        f.write("partial write")

    resumed = run_crawl(
        spark, web_fixture["seed_jobs"], web_fixture["web_pages"],
        web_fixture["robots_src"], CFG, store=part_store, resume=True,
    )
    assert part_store.current_round() == full_store.current_round()
    assert _tables_signature(resumed) == _tables_signature(full)


def test_commit_atomicity(spark, tmp_path):
    store = SnapshotStore(str(tmp_path), spark)
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    store.commit_round(0, {"t": (df, "state")})
    assert store.current_round() == 0
    assert store.read("t").count() == 5

    # append-table lineage across rounds
    store.commit_round(1, {"a": (df, "append")})
    store.commit_round(2, {"a": (df, "append")})
    assert store.read("a").count() == 10
    assert store.read("a", round_no=1).count() == 5
    # state table carried forward untouched
    assert store.read("t").count() == 5


def test_time_travel_rollback(spark, tmp_path):
    store = SnapshotStore(str(tmp_path), spark)
    for k in range(3):
        df = spark.range(k + 1).selectExpr("id")
        store.commit_round(k, {"s": (df, "state")})
    assert store.read("s", round_no=0).count() == 1
    assert store.read("s", round_no=2).count() == 3
    # _CURRENT survives torn tmp files
    cur = os.path.join(str(tmp_path), "_CURRENT")
    with open(cur) as f:
        assert json.load(f)["round"] == 2
