"""Two-phase politeness window: equivalence with the naive global window,
budget enforcement, determinism under skew."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators.politeness import (
    select_polite_batch,
)

BUDGET = 5


def _frontier(spark):
    # skewed: host h0 gets 70% of rows
    return spark.range(400).select(
        F.when(F.col("id") % 10 < 7, F.lit("h0.test"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 10).cast("string")))
        .alias("host"),
        F.concat(F.lit("http://x/"), F.col("id")).alias("url"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.lit("t").alias("task_id"),
    )


def test_budget_enforced(spark):
    out = select_polite_batch(_frontier(spark), BUDGET, salt_buckets=4, order_cols=("depth", "url"))
    per_host = (
        out.filter("selected").groupBy("host").count().collect()
    )
    assert all(r["count"] <= BUDGET for r in per_host)


def test_equals_naive_window(spark):
    f = _frontier(spark)
    out = select_polite_batch(f, BUDGET, salt_buckets=4, order_cols=("depth", "url"))
    got = sorted(
        (r["host"], r["url"]) for r in out.filter("selected").collect()
    )
    w = Window.partitionBy("host").orderBy("priority", "url")
    naive = (
        f.withColumnRenamed("depth", "priority")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BUDGET)
    )
    want = sorted((r["host"], r["url"]) for r in naive.collect())
    assert got == want


def test_total_preserved(spark):
    f = _frontier(spark)
    out = select_polite_batch(f, BUDGET, salt_buckets=4, order_cols=("depth", "url"))
    assert out.count() == f.count()


def test_deterministic_across_runs(spark):
    f = _frontier(spark).repartition(7)  # different physical layout
    a = sorted(map(tuple, select_polite_batch(f, BUDGET, 4, order_cols=("depth", "url")).collect()))
    b = sorted(map(tuple, select_polite_batch(f.repartition(3), BUDGET, 4, order_cols=("depth", "url")).collect()))
    assert a == b


def test_zipf_host_distribution():
    """The Zipf fixture variant: deterministic, long-tailed, all hosts in
    range — the skew shape the salted-politeness bench rep crawls."""
    from collections import Counter

    from distributed_web_crawling_and_indexing_system_gcp_spark.sources import webgen

    n, hosts = 20_000, 8
    assign = [webgen.zipf_host_of(i, hosts, 1.2) for i in range(n)]
    assert assign == [webgen.zipf_host_of(i, hosts, 1.2) for i in range(n)]
    counts = Counter(assign)
    assert set(counts) <= set(range(hosts))
    shares = [counts.get(h, 0) / n for h in range(hosts)]
    # hot head: rank-0 host carries 30-50%; monotone-ish long tail; the
    # tail host still gets traffic (every host exists)
    assert 0.30 <= shares[0] <= 0.50
    assert shares[0] > 2.5 * shares[3] > 0
    assert counts.get(hosts - 1, 0) > 0
    # and the web generator threads it through consistently: page url host
    # == host of the page index under the same function
    def host_fn(i, nh):
        return webgen.zipf_host_of(i, nh, 1.2)

    for i in (0, 5, 13, 777):
        u = webgen.url_of(i, hosts, host_fn)
        assert u.startswith(f"http://h{host_fn(i, hosts)}.test/")


# ---------------------------------------------------------------------------
# crawl-delay-aware budgets
# ---------------------------------------------------------------------------

def test_crawl_delay_parsing(spark):
    from distributed_web_crawling_and_indexing_system_gcp_spark.operators.politeness import (
        crawl_delay_seconds,
    )

    rows = spark.createDataFrame(
        [
            ("a", "User-agent: *\nCrawl-delay: 5\nDisallow: /x/"),
            ("b", "User-agent: *\ncrawl-DELAY:   2.5\n"),  # case + float
            ("c", "User-agent: *\nDisallow: /"),            # no directive
            ("d", None),                                     # failed fetch
        ],
        "host string, rules_txt string",
    )
    got = {
        r["host"]: r["d"]
        for r in rows.select(
            "host", crawl_delay_seconds(F.col("rules_txt")).alias("d")
        ).collect()
    }
    assert got == {"a": 5.0, "b": 2.5, "c": 1.0, "d": 1.0}


def test_host_budget_from_delay(spark):
    from distributed_web_crawling_and_indexing_system_gcp_spark.operators.politeness import (
        host_budget_from_delay,
    )

    rules = spark.createDataFrame(
        [
            ("h5", "User-agent: *\nCrawl-delay: 5\n"),   # 60/5 = 12
            ("h03", "User-agent: *\nCrawl-delay: 0.3\n"),  # clamped to 1s -> 60 -> cap 40
            ("hx", "User-agent: *\n"),                     # default 1s -> cap 40
        ],
        "host string, rules_txt string",
    )
    got = {
        r["host"]: r["host_budget"]
        for r in host_budget_from_delay(
            rules, round_seconds=60, max_budget=40
        ).collect()
    }
    assert got == {"h5": 12, "h03": 40, "hx": 40}


def test_delay_aware_selection_matches_naive_per_host_budget(spark):
    from distributed_web_crawling_and_indexing_system_gcp_spark.operators.politeness import (
        host_budget_from_delay,
        select_polite_batch_delay_aware,
    )

    f = _frontier(spark)
    rules = spark.createDataFrame(
        [
            ("h0.test", "User-agent: *\nCrawl-delay: 10\n"),  # budget 6
            ("h7", "User-agent: *\nCrawl-delay: 30\n"),       # budget 2
        ],
        "host string, rules_txt string",
    )
    budgets = host_budget_from_delay(rules, round_seconds=60, max_budget=40)
    out = select_polite_batch_delay_aware(
        f, budgets, default_budget=3, salt_buckets=4, order_cols=("depth", "url")
    )
    sel = out.filter(F.col("selected"))
    got = {
        r["host"]: r["n"]
        for r in sel.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    # h0.test has 280 rows (budget 6); h7/h8/h9 have 40 rows each;
    # h7 budget 2; h8/h9 default 3
    assert got["h0.test"] == 6
    assert got["h7"] == 2
    assert all(v == 3 for h, v in got.items() if h not in ("h0.test", "h7"))

    # bit-identical to the naive per-host window with the same budgets
    w = Window.partitionBy("host").orderBy(F.col("depth").asc(), F.col("url").asc())
    joined = f.join(budgets, "host", "left").withColumn(
        "_b", F.coalesce(F.col("host_budget"), F.lit(3))
    )
    naive = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("_b"))
        .select("host", "url")
    )
    assert sel.select("host", "url").exceptAll(naive).count() == 0
    assert naive.exceptAll(sel.select("host", "url")).count() == 0


def test_crawl_delay_per_agent_group_resolution(spark):
    """A robots.txt with a UA-specific group must yield THAT group's
    delay, not the file's first/'*' directive (VERDICT r4 #5) — resolved
    by the same RobotFileParser the gate uses."""
    from distributed_web_crawling_and_indexing_system_gcp_spark.operators.politeness import (
        host_budget_from_delay,
    )

    rules = spark.createDataFrame(
        [
            # '*' group first in the file; our UA's group later and
            # stricter — per-agent resolution must pick 10 (budget 6),
            # first-directive regex would wrongly pick 1 (budget 40)
            ("ua", "User-agent: *\nCrawl-delay: 1\n\n"
                   "User-agent: MyDistributedCrawler\nCrawl-delay: 10\n"),
            # only a different bot constrained -> '*' group (delay 2)
            ("other", "User-agent: weirdbot\nCrawl-delay: 30\n\n"
                      "User-agent: *\nCrawl-delay: 2\n"),
            # no directive anywhere -> default 1 s
            ("none", "User-agent: *\nDisallow: /private/\n"),
            # failed robots fetch -> default
            ("null", None),
        ],
        "host string, rules_txt string",
    )
    got = {
        r["host"]: r["host_budget"]
        for r in host_budget_from_delay(
            rules, round_seconds=60, max_budget=40
        ).collect()
    }
    assert got == {"ua": 6, "other": 30, "none": 40, "null": 40}

    # the regex fast path (per_agent=False) keeps first-directive
    # semantics — the documented single-group-only contract
    got_fast = {
        r["host"]: r["host_budget"]
        for r in host_budget_from_delay(
            rules, round_seconds=60, max_budget=40, per_agent=False
        ).collect()
    }
    assert got_fast["ua"] == 40  # first directive (1 s) — the mis-read
