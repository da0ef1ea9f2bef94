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


__all__ = ["select_polite_batch"]
