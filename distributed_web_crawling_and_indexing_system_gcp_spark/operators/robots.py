"""robots.txt gate as a broadcast-join + vectorized rule evaluation.

Reference semantics (/root/reference/src/crawler/crawler_node.py:109-140):
- robots fetched once per host, cached for the process lifetime;
- the gate evaluates ``RobotFileParser.can_fetch(UA, url)`` on the raw
  cleaned URL (NOT the normalized one);
- fetch failure ⇒ a permissive ``Allow: /`` parser is cached ⇒ allowed.

Engine form: a ``robots_rules(host, rules_txt)`` dimension table (null
``rules_txt`` = fetch failed = permissive), broadcast-joined onto the
fetch batch by host, evaluated by an Arrow-batched pandas UDF that builds
one ``RobotFileParser`` per *distinct* rules text per batch (hosts repeat
heavily within a batch, so parser construction amortizes).
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType

USER_AGENT = "MyDistributedCrawler/1.0 (+http://example.com/botinfo)"
# ^ crawler_node.py:36


@pandas_udf(BooleanType())
def robots_allowed_udf(rules_txt: pd.Series, url: pd.Series) -> pd.Series:
    parsers: dict[str, RobotFileParser] = {}

    def parser_for(txt: str) -> RobotFileParser:
        rp = parsers.get(txt)
        if rp is None:
            rp = RobotFileParser()
            rp.parse(txt.splitlines())
            parsers[txt] = rp
        return rp

    out = []
    for txt, u in zip(rules_txt, url):
        if txt is None or u is None:
            # failed robots fetch ⇒ permissive (crawler_node.py:133-140)
            out.append(True)
        else:
            out.append(parser_for(txt).can_fetch(USER_AGENT, u))
    return pd.Series(out, dtype="bool")


@pandas_udf(DoubleType())
def crawl_delay_udf(rules_txt: pd.Series) -> pd.Series:
    """Per-agent ``Crawl-delay`` resolution (seconds; null = no directive).

    Routed through the SAME ``RobotFileParser`` the allow/deny gate uses,
    so group matching is identical to the gate's: a ``User-agent:``
    group naming this crawler's agent token wins over the ``*`` group
    (RFC 9309 group selection as implemented by urllib.robotparser) —
    the reference crawler reads robots through the same stdlib parser
    (/root/reference/src/crawler/crawler_node.py:109-140), so this IS
    the delay a compliant deployment of it would observe.  stdlib
    contract: integer delays only (a float directive parses as absent);
    the single-group float-tolerant fast path stays available as
    ``politeness.crawl_delay_seconds`` (pure Catalyst).

    One parser per *distinct* rules text per Arrow batch — hosts repeat
    heavily within a batch, so parser construction amortizes exactly as
    in :func:`robots_allowed_udf`.
    """
    delays: dict[str, float | None] = {}

    def delay_for(txt: str) -> float | None:
        if txt not in delays:
            rp = RobotFileParser()
            rp.parse(txt.splitlines())
            d = rp.crawl_delay(USER_AGENT)
            delays[txt] = None if d is None else float(d)
        return delays[txt]

    return pd.Series(
        [None if txt is None else delay_for(txt) for txt in rules_txt],
        dtype="float64",
    )


def gate_on_robots(
    batch: DataFrame,
    robots_rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Adds ``robots_allowed: boolean``; hosts missing from the rules
    table are permissive (left join ⇒ null rules ⇒ True)."""
    rules = robots_rules.select(
        F.col("host").alias(host_col), F.col("rules_txt").alias("_rules_txt")
    )
    joined = batch.join(F.broadcast(rules), host_col, "left")
    return joined.withColumn(
        "robots_allowed", robots_allowed_udf(F.col("_rules_txt"), F.col(url_col))
    ).drop("_rules_txt")


def missing_hosts(batch: DataFrame, robots_rules: DataFrame, host_col: str = "host") -> DataFrame:
    """Distinct hosts in the batch with no cached robots rule — the set to
    fetch this round (once per new host, matching the reference's
    fetch-once cache)."""
    return (
        batch.select(F.col(host_col).alias("host"))
        .distinct()
        .join(robots_rules.select("host"), "host", "left_anti")
    )


__all__ = [
    "USER_AGENT",
    "robots_allowed_udf",
    "crawl_delay_udf",
    "gate_on_robots",
    "missing_hosts",
]
