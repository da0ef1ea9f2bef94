"""Stall detection + active-task cap (reference UI/main.py:366-428)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import tasks as TK

NOW = dt.datetime(2024, 1, 3, 0, 0, 0)


def _tasks(spark, rows):
    return spark.createDataFrame(
        [(tid, st, NOW - dt.timedelta(seconds=age)) for tid, st, age in rows],
        "task_id string, status string, last_update timestamp",
    )


def test_stall_thresholds(spark):
    df = _tasks(
        spark,
        [
            ("t_sub_ok", "submitted", 100),       # under 120 s → unchanged
            ("t_sub_stall", "submitted", 121),    # over 120 s → failed
            ("t_prog_ok", "in_progress", 150),    # under warn → unchanged
            ("t_prog_warn", "in_progress", 300),  # 180<age≤600 → warning
            ("t_prog_stall", "in_progress", 601), # over 600 s → failed
            ("t_done", "completed", 10_000),      # terminal → untouched
            ("t_failed", "failed", 10_000),
        ],
    )
    out = {
        r["task_id"]: r
        for r in TK.stall_detect(df, F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .collect()
    }
    assert out["t_sub_ok"]["new_status"] == "submitted"
    assert out["t_sub_stall"]["new_status"] == "failed"
    assert "submitted state" in out["t_sub_stall"]["error"]
    assert out["t_prog_ok"]["new_status"] == "in_progress"
    assert out["t_prog_ok"]["warning"] is None
    assert out["t_prog_warn"]["new_status"] == "in_progress"
    assert out["t_prog_warn"]["warning"] == "slow_progress"
    assert out["t_prog_stall"]["new_status"] == "failed"
    assert "10+ minutes" in out["t_prog_stall"]["error"]
    assert out["t_done"]["new_status"] == "completed"
    assert out["t_failed"]["new_status"] == "failed"
    assert out["t_done"]["error"] is None


def test_cap_active_tasks(spark):
    # 5 active tasks, cap 2 → the 2 most recently updated stay active,
    # 3 oldest auto-complete; terminal tasks untouched
    rows = [(f"t{i}", "in_progress", 60 * i) for i in range(5)]
    rows.append(("t_done", "completed", 0))
    df = _tasks(spark, rows)
    flagged = TK.stall_detect(
        df, F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    out = {r["task_id"]: r["new_status"]
           for r in TK.cap_active_tasks(flagged, max_active=2).collect()}
    # t0 (age 0) and t1 (age 60) are most recent → stay; t2..t4 completed
    assert out["t0"] == "in_progress"
    assert out["t1"] == "in_progress"
    assert out["t2"] == "completed"
    assert out["t3"] == "completed"
    assert out["t4"] == "completed"
    assert out["t_done"] == "completed"
