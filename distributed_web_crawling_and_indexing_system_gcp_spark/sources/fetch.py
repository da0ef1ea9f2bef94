"""Fetch stage: synthetic closed-world fetcher (tests/bench) + the real
network fetcher's shape (stubbed — no network in this sandbox).

Reference fetch (/root/reference/src/crawler/crawler_node.py:270-285):
``requests.get(url, timeout=10, headers={'User-Agent': UA},
allow_redirects=True)`` + ``raise_for_status``; outcomes:
- HTML 2xx            → process
- non-HTML 2xx        → skip (ack)                       (crawler_node.py:378-381)
- timeout             → nack = redeliver                 (crawler_node.py:278-281)
- other request error → ack = drop                       (crawler_node.py:282-285)

Synthetic form: the web is a ``web_pages(url, final_url, status,
content_type, html, fetch_ms)`` fixture table; "fetching" a batch is a
LEFT JOIN on the exact request URL — fully deterministic, no Python in
the path.  Unknown URL ⇒ connection error (status -2).  Status codes:
-1 = timeout, -2 = unreachable, ≥400 = HTTP error (raise_for_status),
else OK.

The production fetcher (`fetch_over_network`) keeps the exact stage
signature — grouped ``applyInPandas`` per (host, salt) partition so one
host's requests serialize within a task (true per-host politeness) while
hosts parallelize across tasks — but raises ``NotImplementedError``: no
outbound network here, and wiring ``requests`` in is deployment-specific.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_RESULT_COLS = ("final_url", "http_status", "content_type", "html", "fetch_ms")


def fetch_synthetic(batch: DataFrame, web_pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Resolve a fetch batch against the closed-world fixture.

    Adds ``final_url, http_status, content_type, html, fetch_ms``.
    URL not in the fixture ⇒ http_status = -2 (unreachable).

    Join shape matters: a naive ``batch LEFT JOIN web`` can only build the
    web side (Spark cannot broadcast the preserved side of an outer
    join), so Catalyst sort-merge-joins it — sorting/exchanging the
    ~20 KB-html web rows EVERY round, which at bench scale was the
    dominant memory-pressure source.  Decomposed instead into
    (web ⋈ broadcast(batch)) ∪ (batch ⋉̸ broadcast(web.urls)):
    the heavy web relation is only ever STREAMED against small broadcast
    hash tables — no sort, no exchange of page bodies.  (The real
    network fetcher replaces this operator entirely; this is the fixture
    path used by tests/bench.)
    """
    pages = web_pages.select(
        F.col("url").alias(url_col),
        F.col("final_url").alias("final_url"),
        F.col("status").alias("http_status"),
        "content_type",
        "html",
        "fetch_ms",
    )
    hit = pages.join(F.broadcast(batch), url_col, "inner").select(
        *batch.columns, *[c for c in pages.columns if c != url_col]
    )
    missed = batch.join(
        F.broadcast(pages.select(url_col)), url_col, "left_anti"
    ).select(
        "*",
        F.lit(None).cast("string").alias("final_url"),
        F.lit(-2).alias("http_status"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(None).cast("string").alias("html"),
        F.lit(None).cast("int").alias("fetch_ms"),
    )
    return hit.unionByName(missed)


def classify_fetch(df: DataFrame) -> DataFrame:
    """Adds ``fetch_outcome``: ok_html | ok_other | timeout | error.

    Mirrors the reference's routing: timeout ⇒ retryable; HTTP/connection
    error ⇒ dropped; 2xx non-HTML ⇒ acknowledged but not processed.
    """
    s = F.col("http_status")
    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    return df.withColumn(
        "fetch_outcome",
        F.when(s == -1, F.lit("timeout"))
        .when((s < 0) | (s >= 400), F.lit("error"))
        .when(ct.contains("html"), F.lit("ok_html"))
        .otherwise(F.lit("ok_other")),
    )


def fetch_over_network(
    batch: DataFrame,
    timeout_s: int = 10,
    host_col: str = "host",
    salt_col: str = "host_salt",
    url_col: str = "url",
    min_interval_s: float = 1.0,
) -> DataFrame:
    """Production fetch stage shape: grouped applyInPandas per
    (host, salt) so requests to one host serialize inside a task.

    ``min_interval_s`` is the within-task pacing budget: requests inside
    one (host, salt) group are spaced ≥ this interval — the reference's
    hard-coded 1 req/s sleep (crawler_node.py:35,261) made per-host and
    enforced where the requests actually execute.  (The crawl plan's
    per-round budget bounds volume; this bounds instantaneous rate.)
    With ``salt_buckets`` salt partitions per host, set
    ``min_interval_s = salt_buckets / target_host_rps``.

    STUB: the request body raises NotImplementedError executor-side (no
    network access in this environment).  The signature, grouping, output
    schema, and the pacing/batching iterator (``iter_paced_batches``,
    unit-tested without network) are the real ones — swap the marked line
    for a ``requests.Session`` call on deploy.
    """
    out_schema = (
        batch.schema.simpleString()[7:-1]
        + ", final_url string, http_status int, content_type string, "
        + "html string, fetch_ms int"
    )

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        for sub in iter_paced_batches(pdf, max_batch=64,
                                      min_interval_s=min_interval_s):
            for _url in sub[url_col]:
                raise NotImplementedError(  # requests.get(_url, timeout=timeout_s, ...)
                    "network fetch is not available in this sandbox; use "
                    "fetch_synthetic(batch, web_pages) with a fixture table"
                )
        return pdf

    return batch.groupBy(host_col, salt_col).applyInPandas(fetch_group, out_schema)


def iter_fetch_batches(pdf: pd.DataFrame, max_batch: int) -> Iterator[pd.DataFrame]:
    """Helper the production fetcher would use to bound in-flight rows."""
    for start in range(0, len(pdf), max_batch):
        yield pdf.iloc[start : start + max_batch]


def iter_paced_batches(
    pdf: pd.DataFrame,
    max_batch: int,
    min_interval_s: float,
    sleep=None,
    clock=None,
) -> Iterator[pd.DataFrame]:
    """Batching iterator with a per-row pacing budget: consecutive rows are
    released ≥ ``min_interval_s`` apart (row release time, not batch).

    Injected ``sleep``/``clock`` make the pacing unit-testable without
    wall-clock waits (tests/test_crawl_parity.py::test_paced_batches).
    """
    import time as _time

    sleep = sleep or _time.sleep
    clock = clock or _time.monotonic
    last: float | None = None
    for batch in iter_fetch_batches(pdf, max_batch):
        rows = []
        for _, row in batch.iterrows():
            now = clock()
            if last is not None and min_interval_s > 0:
                wait = last + min_interval_s - now
                if wait > 0:
                    sleep(wait)
                    now = last + min_interval_s
            last = now
            rows.append(row)
        yield pd.DataFrame(rows, columns=batch.columns)


__all__ = [
    "FETCH_RESULT_COLS",
    "fetch_synthetic",
    "classify_fetch",
    "fetch_over_network",
    "iter_fetch_batches",
    "iter_paced_batches",
]
