"""Structured-Streaming metrics view: file source → watermarked windowed
aggregates + per-task counters into a memory sink (T4/T6 analogue)."""

from __future__ import annotations

import datetime as dt

from distributed_web_crawling_and_indexing_system_gcp_spark.streaming.metrics import (
    health_windows,
    read_metrics_stream,
    task_progress,
)


def _write_metrics(spark, path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            (
                "crawler" if i % 3 else "master",
                ["url_crawled", "urls_scheduled", "url_indexed"][i % 3],
                f"task-{i % 2}",
                f"http://h.test/{i}",
                1,
                i % 4,
                i // 40,
                base + dt.timedelta(seconds=37 * i),
            )
        )
    df = spark.createDataFrame(
        rows,
        "node_type string, event string, task_id string, url string, "
        "count long, partition_id int, round int, ts timestamp",
    )
    df.coalesce(2).write.mode("overwrite").parquet(path)


def test_streaming_task_progress(spark, tmp_path):
    path = str(tmp_path / "metrics")
    _write_metrics(spark, path)
    stream = read_metrics_stream(spark, path)
    assert stream.isStreaming
    q = (
        task_progress(stream)
        .writeStream.format("memory")
        .queryName("progress_t")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r["task_id"]: r for r in spark.sql("SELECT * FROM progress_t").collect()}
    finally:
        q.stop()
    assert set(rows) == {"task-0", "task-1"}
    total_crawled = sum(r["crawled_urls"] or 0 for r in rows.values())
    assert total_crawled == 40  # url_crawled fires at i%3==0 → 40 events
    total_sched = sum(r["scheduled_urls"] or 0 for r in rows.values())
    assert total_sched == 40


def test_streaming_health_windows(spark, tmp_path):
    path = str(tmp_path / "metrics2")
    _write_metrics(spark, path)
    stream = read_metrics_stream(spark, path)
    q = (
        health_windows(stream, window="10 minutes", watermark="20 minutes")
        .writeStream.format("memory")
        .queryName("health_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM health_t").collect()
    finally:
        q.stop()
    # append mode only emits windows the watermark has closed; with 120
    # events over ~74 min and a 20-min watermark, early windows finalize
    assert len(rows) > 0
    assert all(r["events"] > 0 for r in rows)
    assert {r["node_type"] for r in rows} <= {"master", "crawler"}


def test_streaming_task_progress_stateful(spark, tmp_path):
    """applyInPandasWithState carries per-task state ACROSS micro-batches:
    with one input file per trigger, later emissions must show cumulative
    totals, and the final state equals the batch ground truth."""
    from distributed_web_crawling_and_indexing_system_gcp_spark.streaming.metrics import (
        task_progress_stateful,
    )

    path = str(tmp_path / "metrics_stateful")
    _write_metrics(spark, path)  # written as 2 parquet files
    stream = (
        spark.readStream.schema(
            "node_type string, event string, task_id string, url string, "
            "count long, partition_id int, round int, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)  # force ≥2 micro-batches
        .parquet(path)
    )
    q = (
        task_progress_stateful(stream)
        .writeStream.format("memory")
        .queryName("progress_stateful_t")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM progress_stateful_t").collect()
    finally:
        q.stop()
    # ≥2 emissions per task (one per micro-batch) proves multi-batch flow
    per_task = {}
    for r in rows:
        per_task.setdefault(r["task_id"], []).append(r)
    assert set(per_task) == {"task-0", "task-1"}
    assert all(len(v) >= 2 for v in per_task.values())
    # the LAST emission per task is cumulative and matches ground truth
    final = {t: max(v, key=lambda r: r["crawled_urls"] + r["scheduled_urls"])
             for t, v in per_task.items()}
    assert sum(r["crawled_urls"] for r in final.values()) == 40
    assert sum(r["scheduled_urls"] for r in final.values()) == 40
    assert sum(r["indexed_urls"] for r in final.values()) == 40
    # state actually carried: totals GROW across the task's emissions
    for t, v in per_task.items():
        seq = sorted(
            r["crawled_urls"] + r["indexed_urls"] + r["scheduled_urls"]
            for r in v
        )
        assert seq[-1] > seq[0], f"{t}: no cumulative growth across batches"
