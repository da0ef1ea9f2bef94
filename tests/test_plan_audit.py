"""Audit-tool correctness: the global-window detector must flag an
unpartitioned full-relation Window and NOT flag (a) partitioned windows
or (b) windows whose input subtree is already limit-bounded.

Round-2 verdict item: the old check was inverted (it treated a limit
ABOVE the window as making it safe, and flagged 7 healthy queries).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.plan_audit import audit_plan

# the seven queries the inverted round-2 check falsely flagged all use
# key-partitioned windows or TakeOrderedAndProject-bounded inputs
WINDOW_QUERIES = [
    "politeness_window",
    "oldest_eviction",
    "export_page",
    "list_truncation",
    "sessionize",
    "search_topk",
    "dedup_keep_latest",
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def kv(spark):
    return spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )


def test_bad_global_window_is_caught(spark, kv):
    bad = kv.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    assert audit_plan("bad", _plan(bad))["global_window"] is True


def test_partitioned_window_not_flagged(spark, kv):
    good = kv.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("v"))
    )
    assert audit_plan("good", _plan(good))["global_window"] is False


def test_limit_bounded_window_not_flagged(spark, kv):
    # global window over ≤10 rows: TakeOrderedAndProject feeds the Window
    bounded = (
        kv.orderBy("v")
        .limit(10)
        .withColumn("rn", F.row_number().over(Window.orderBy("v")))
    )
    assert audit_plan("bounded", _plan(bounded))["global_window"] is False


def test_limit_above_window_still_flagged(spark, kv):
    # the round-2 inversion: a limit ABOVE the window does not bound the
    # window's own global sort — must still flag.  (A rank-like window
    # would be rescued by Catalyst's LimitPushDownThroughWindow; a
    # running sum cannot be, so the full-relation Window survives.)
    bad = kv.withColumn(
        "run", F.sum("v").over(Window.orderBy("v"))
    ).limit(5)
    assert audit_plan("bad_above", _plan(bad))["global_window"] is True


def test_shipped_window_queries_audit_clean(spark):
    import __spark_entry__ as E

    queries = {**E.queries(), **E.extra_queries()}
    for name in WINDOW_QUERIES:
        df = queries[name](spark, "/root/testdata/sf0.001")
        checks = audit_plan(name, _plan(df))
        assert not checks["global_window"], f"{name} flagged global window"
        assert not checks["cartesian"], f"{name} has cartesian product"


def test_search_partitioned_plan_prunes_term_buckets(spark):
    """VERDICT r2 item 4 done-criterion: the partitioned-search scan must
    carry PartitionFilters on term_bucket (bucket-pruned index read)."""
    import re

    import __spark_entry__ as E

    df = E.queries()["search_partitioned"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "no PartitionFilters in the postings scan"
    assert "term_bucket" in m.group(1)
