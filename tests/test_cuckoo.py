"""Cuckoo-filter shard fallback: no false negatives (incl. overflow path),
filter_new dispatch equivalence with exact anti-join, incremental merge,
and the end-to-end crawl parity under filter_kind='cuckoo'."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import (
    cuckoo as CK,
    seen as S,
)

SHARDS, BUCKETS = 4, 512


def _seen_df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("http://h.test/"), F.col("id")).alias("url"),
    )


def test_no_false_negatives(spark):
    seen = _seen_df(spark, 0, 800)  # load factor ~0.4 across 4 shards
    shards = S.shards_to_dict(CK.build_cuckoo_shards(seen, SHARDS, BUCKETS))
    assert all(b[:4] == b"CKF1" for b in shards.values())
    flagged = CK.cuckoo_maybe_seen(spark, seen, shards, SHARDS)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_overflow_keeps_exactness(spark):
    # overload a tiny table so the kick loop fails → overflow list
    seen = _seen_df(spark, 0, 600)
    shards = S.shards_to_dict(CK.build_cuckoo_shards(seen, 1, 64))  # 256 slots
    flagged = CK.cuckoo_maybe_seen(spark, seen, shards, 1)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_filter_new_dispatch_equals_exact(spark):
    seen = _seen_df(spark, 0, 400)
    shards = S.shards_to_dict(CK.build_cuckoo_shards(seen, SHARDS, BUCKETS))
    cands = _seen_df(spark, 200, 600)
    got = sorted(r["url"] for r in S.filter_new(cands, seen, shards, SHARDS).collect())
    want = sorted(r["url"] for r in S.filter_new(cands, seen).collect())
    assert got == want
    assert len(want) == 200


def test_merge_shards_incremental(spark):
    a = S.shards_to_dict(CK.build_cuckoo_shards(_seen_df(spark, 0, 100), SHARDS, BUCKETS))
    new = _seen_df(spark, 100, 200).collect()
    keys = np.array([r["url_hash"] for r in new], dtype=np.int64)
    by_shard = {
        int(s): keys[np.mod(keys, SHARDS) == s]
        for s in np.unique(np.mod(keys, SHARDS))
    }
    merged = CK.merge_shards(a, by_shard, BUCKETS)
    flagged = CK.cuckoo_maybe_seen(spark, _seen_df(spark, 0, 200), merged, SHARDS)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_crawl_parity_with_cuckoo(spark, web_fixture):
    from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import (
        CrawlConfig,
        run_crawl,
    )
    from tests.oracle import crawl_oracle

    cfg = CrawlConfig(
        max_depth=2, politeness_budget=6, salt_buckets=4, max_attempts=2,
        bloom_shards=8, bloom_bits_per_shard=1 << 16, max_rounds=16,
        filter_kind="cuckoo",
    )
    out = run_crawl(
        spark, web_fixture["seed_jobs"], web_fixture["web_pages"],
        web_fixture["robots_src"], cfg,
    )
    oracle = crawl_oracle(
        web_fixture["seed_rows"], web_fixture["web_rows"],
        web_fixture["robots_rows"],
        max_depth=2, budget=6, max_attempts=2, max_rounds=16,
    )
    assert {r["url"] for r in out["seen"].collect()} == oracle.seen


def test_update_bloom_big_cuckoo_delta_rebuilds_distributed(spark):
    """A cuckoo delta above bloom_delta_collect_max must NOT collect the
    delta driver-side; it rebuilds the shards executor-side from the full
    seen set and stays exact (no false negatives)."""
    from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import (
        CrawlConfig,
        _update_bloom,
    )

    cfg = CrawlConfig(
        filter_kind="cuckoo",
        bloom_shards=SHARDS,
        bloom_bits_per_shard=BUCKETS * 64,
        bloom_delta_collect_max=50,  # force the "too big to collect" path
    )
    old = _seen_df(spark, 0, 100)
    delta = _seen_df(spark, 100, 300)  # 200 > 50
    seen_full = old.unionByName(delta)
    shards0 = S.shards_to_dict(CK.build_cuckoo_shards(old, SHARDS, BUCKETS))
    shards = _update_bloom(shards0, delta, 200, cfg, seen_full=seen_full)
    flagged = CK.cuckoo_maybe_seen(spark, seen_full, shards, SHARDS)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
