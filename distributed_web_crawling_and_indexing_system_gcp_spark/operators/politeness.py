"""Per-host politeness budget — skew-proof two-phase top-k per host.

The reference's politeness is a flat ``time.sleep(1)`` per task per
crawler process (/root/reference/src/crawler/crawler_node.py:35,261) —
global 1 req/s/node, NOT per-host, and a single hot host can monopolize a
crawler.  Per the north rule this engine enforces an explicit per-host
budget per crawl round instead: at most ``budget`` URLs per host advance
to the fetch stage each round; the overflow stays pending for later
rounds (deterministic deferral, same depth).

Naive ``row_number() over (partition by host)`` puts every row of a hot
host into one task — the classic skew stall.  The two-phase form is
equivalent and skew-proof:

  phase 1: rank within (host, salt)  — salt = xxhash64(url) % S spreads a
           hot host over S tasks; keep per-bucket top-``budget``.
  phase 2: rank within host over the ≤ budget*S survivors; keep
           top-``budget``.

The global per-host top-``budget`` under a total order is always contained
in the union of per-salt-bucket top-``budget``s, so the result is
bit-identical to the naive window while the heavy partition is S× smaller.
Phase 2 windows ONLY the ≤ budget·S survivors per host (never the full
host partition), so no task ever sorts more than budget·S rows — the hot
host costs the same as any other.  The two union branches share the
phase-1 exchange (Spark ReusedExchange), so the extra branch re-sorts but
does not re-shuffle.  Ordering key is (priority, url) — the engine's
deterministic frontier order (SURVEY.md §2.6 O6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_polite_batch(
    frontier: DataFrame,
    budget: int,
    salt_buckets: int = 16,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "url"),
) -> DataFrame:
    """Adds ``selected: boolean`` — True for rows within the host budget.

    Deterministic: selection depends only on (host, order_cols).
    """
    order = [F.col(c).asc() for c in order_cols]

    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))

    # phase 2 over SURVIVORS ONLY (≤ budget·S rows per host) — a window
    # over the full host partition would sort the hot host in one task
    # (serial Amdahl floor); bounding the partition keeps every task small
    w2 = Window.partitionBy(host_col).orderBy(*order)
    survivors = phase1.filter(F.col("_r1") <= budget).withColumn(
        "selected", F.row_number().over(w2) <= budget
    )
    overflow = phase1.filter(F.col("_r1") > budget).withColumn(
        "selected", F.lit(False)
    )
    cols = [*frontier.columns, "selected"]
    return survivors.select(cols).unionByName(overflow.select(cols))


def crawl_delay_seconds(rules_col, default_delay: float = 1.0):
    """Crawl-delay (seconds) from a robots.txt body, as a Column.

    Pure-Catalyst single-group semantics: the FIRST ``Crawl-delay:``
    directive in the file applies (the reference's synthetic robots and
    the overwhelming majority of real robots.txt files have one
    ``User-agent: *`` group; per-agent group resolution would need the
    RobotFileParser UDF path in operators/robots.py).  Missing/blank
    directive or null rules → ``default_delay``.  crawler_node.py never
    reads Crawl-delay at all (its politeness is a flat 1 s sleep,
    crawler_node.py:35,261) — honoring the directive is the
    parity-plus behavior a polite production crawler needs.
    """
    d = F.regexp_extract(
        rules_col, r"(?i)crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)", 1
    )
    return F.when(
        rules_col.isNull() | (d == ""), F.lit(float(default_delay))
    ).otherwise(d.cast("double"))


def host_budget_from_delay(
    robots_rules: DataFrame,
    round_seconds: float,
    default_delay: float = 1.0,
    max_budget: int | None = None,
    host_col: str = "host",
    rules_col: str = "rules_txt",
    per_agent: bool = True,
) -> DataFrame:
    """Per-host round budget implied by Crawl-delay: ``(host, host_budget)``.

    ``host_budget = floor(round_seconds / max(crawl_delay, default_delay))``
    — the number of fetches a host allows inside one round window —
    optionally clamped by ``max_budget`` (the engine-wide cap).  A tiny
    per-host dimension (one row per host), always broadcast at the join.

    ``per_agent=True`` (default) resolves the directive with the same
    ``RobotFileParser`` group matching the robots gate uses (a
    ``User-agent:`` group naming this crawler wins over ``*`` — see
    ``robots.crawl_delay_udf``); ``per_agent=False`` keeps the pure-
    Catalyst first-directive regex fast path (single-group files only).
    The per-host dimension is one row per host, so the Arrow UDF runs
    once per host, never per frontier row.
    """
    if per_agent:
        from . import robots as _robots

        raw = _robots.crawl_delay_udf(F.col(rules_col))
        delay = F.greatest(
            F.coalesce(raw, F.lit(float(default_delay))),
            F.lit(float(default_delay)),
        )
    else:
        delay = F.greatest(
            crawl_delay_seconds(F.col(rules_col), default_delay),
            F.lit(float(default_delay)),
        )
    b = F.floor(F.lit(float(round_seconds)) / delay).cast("int")
    if max_budget is not None:
        b = F.least(b, F.lit(int(max_budget)))
    return robots_rules.select(F.col(host_col).alias(host_col), b.alias("host_budget"))


def select_polite_batch_delay_aware(
    frontier: DataFrame,
    host_budgets: DataFrame,
    default_budget: int,
    salt_buckets: int = 16,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "url"),
) -> DataFrame:
    """``select_polite_batch`` with a PER-HOST budget column instead of a
    constant — the same skew-proof two-phase window (the containment
    proof in the module docstring holds per host for any per-host k).
    Hosts absent from ``host_budgets`` fall back to ``default_budget``.
    """
    order = [F.col(c).asc() for c in order_cols]
    f = frontier.join(F.broadcast(host_budgets), host_col, "left").withColumn(
        "_budget", F.coalesce(F.col("host_budget"), F.lit(int(default_budget)))
    )
    salted = f.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))
    w2 = Window.partitionBy(host_col).orderBy(*order)
    survivors = phase1.filter(F.col("_r1") <= F.col("_budget")).withColumn(
        "selected", F.row_number().over(w2) <= F.col("_budget")
    )
    overflow = phase1.filter(F.col("_r1") > F.col("_budget")).withColumn(
        "selected", F.lit(False)
    )
    cols = [*frontier.columns, "selected"]
    return survivors.select(cols).unionByName(overflow.select(cols))


__all__ = [
    "select_polite_batch",
    "crawl_delay_seconds",
    "host_budget_from_delay",
    "select_polite_batch_delay_aware",
]
