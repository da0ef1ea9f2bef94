"""Structured-Streaming view over the crawl metrics stream.

The reference dashboard is five daemon threads folding Pub/Sub events
into in-process dicts (/root/reference/src/UI/main.py:130-442) — racy,
lost on restart.  Engine equivalent: metrics rows land in the snapshot
store (plans/crawl.py); a Structured Streaming job tails the directory
and maintains the same aggregates incrementally:

- per-task counters (url_crawled / url_indexed / urls_scheduled —
  UI/main.py:241-316, A1)
- health last-seen + stale detection (UI/main.py:351-364, A9/T5) via
  watermarked sliding windows for late events (T6).

These are *optional* for crawl parity (the batch queries in
__spark_entry__ cover the same aggregates); this module exists to show
the streaming path and is exercised by tests/test_streaming.py using the
file source + a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_STREAM_SCHEMA = (
    "node_type string, event string, task_id string, url string, count long, "
    "partition_id int, round int, ts timestamp"
)


def read_metrics_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(METRICS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def task_progress(stream: DataFrame) -> DataFrame:
    """Streaming per-task counters (complete-mode aggregate)."""
    return stream.groupBy("task_id").agg(
        F.sum(F.when(F.col("event") == "url_crawled", F.col("count"))).alias(
            "crawled_urls"
        ),
        F.sum(F.when(F.col("event") == "url_indexed", F.col("count"))).alias(
            "indexed_urls"
        ),
        F.sum(F.when(F.col("event") == "urls_scheduled", F.col("count"))).alias(
            "scheduled_urls"
        ),
        F.max("round").alias("last_round"),
    )


def health_windows(stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Watermarked per-node-type heartbeat counts (late data tolerated up
    to the watermark, then finalized — the streaming analogue of the
    UI's 120 s staleness check)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "node_type")
        .agg(F.count("*").alias("events"), F.max("ts").alias("last_seen"))
        .select("w.start", "w.end", "node_type", "events", "last_seen")
    )


def task_progress_stateful(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-task
    cumulative progress counters with EXPLICIT keyed state, emitted every
    micro-batch (update semantics).

    Unlike ``task_progress`` (a complete-mode aggregate that Spark
    re-emits in full), this carries ``(crawled, indexed, scheduled,
    last_round)`` per task in group state — the scale shape for 10^6+
    concurrent tasks where complete-mode output is unaffordable and the
    reference's in-process dict folding (UI/main.py:241-316) maps to
    keyed state updated per batch.
    """
    import pandas as pd  # noqa: F401  (executor-side)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "task_id string, crawled_urls long, indexed_urls long, "
        "scheduled_urls long, last_round int"
    )
    state_schema = "crawled long, indexed long, scheduled long, last_round int"

    def update(key, pdfs, state):
        import pandas as pd

        crawled = indexed = scheduled = 0
        last_round = -1
        if state.exists:
            crawled, indexed, scheduled, last_round = state.get
        for pdf in pdfs:
            ev, cnt = pdf["event"], pdf["count"].fillna(0)
            crawled += int(cnt[ev == "url_crawled"].sum())
            indexed += int(cnt[ev == "url_indexed"].sum())
            scheduled += int(cnt[ev == "urls_scheduled"].sum())
            rounds = pdf["round"].dropna()
            if not rounds.empty:  # all-null round batch: int(NaN) raises
                last_round = max(last_round, int(rounds.max()))
        state.update((crawled, indexed, scheduled, last_round))
        yield pd.DataFrame(
            [
                {
                    "task_id": key[0],
                    "crawled_urls": crawled,
                    "indexed_urls": indexed,
                    "scheduled_urls": scheduled,
                    "last_round": last_round,
                }
            ]
        )

    return stream.groupBy("task_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = [
    "METRICS_STREAM_SCHEMA",
    "read_metrics_stream",
    "task_progress",
    "task_progress_stateful",
    "health_windows",
]
