"""Task-state lifecycle operators: stall detection and active-task caps.

Re-expresses the reference UI's background task janitor
(/root/reference/src/UI/main.py:366-428, thresholds at main.py:55-60) as a
declarative DataFrame transform instead of a polling thread:

- ``submitted`` tasks with no update for > ``submitted_timeout`` (120 s)
  → ``failed`` with the stalled-in-submitted error string;
- ``in_progress`` tasks quiet for > ``stall_timeout`` (600 s) → ``failed``;
- ``in_progress`` tasks quiet for > ``warn_after`` (180 s) but not yet
  stalled → keep status, set ``warning = 'slow_progress'``;
- ``completed`` / ``failed`` tasks pass through untouched.

``now`` is an explicit parameter (the reference uses wall-clock
``datetime.utcnow()``); passing a literal keeps the operator deterministic
and oracle-checkable.

Scale: a single projection over the task table — no shuffle, no window.
The reference's 30 s polling loop over an in-memory dict becomes a streaming-
friendly stateless map that can run over billions of task rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUBMITTED_TIMEOUT_S = 120
STALL_TIMEOUT_S = 600
WARN_AFTER_S = 180


def stall_detect(
    tasks: DataFrame,
    now: Column,
    status_col: str = "status",
    last_update_col: str = "last_update",
    submitted_timeout: int = SUBMITTED_TIMEOUT_S,
    stall_timeout: int = STALL_TIMEOUT_S,
    warn_after: int = WARN_AFTER_S,
) -> DataFrame:
    """Adds ``age_sec``, ``new_status``, ``warning``, ``error`` columns per
    the reference's dual-threshold rules (main.py:389-405)."""
    age = (F.unix_timestamp(now) - F.unix_timestamp(F.col(last_update_col))).cast(
        "bigint"
    )
    st = F.col(status_col)
    stalled_submitted = (st == "submitted") & (age > submitted_timeout)
    stalled_progress = (st == "in_progress") & (age > stall_timeout)
    slow = (st == "in_progress") & (age > warn_after) & ~stalled_progress
    new_status = (
        F.when(st.isin("completed", "failed"), st)
        .when(stalled_submitted | stalled_progress, F.lit("failed"))
        .otherwise(st)
    )
    error = (
        F.when(
            stalled_submitted,
            F.lit(
                "Task appears to be stalled in submitted state "
                "(no updates for 2+ minutes)"
            ),
        )
        .when(
            stalled_progress,
            F.lit(f"Task appears to be stalled (no updates for {stall_timeout // 60}+ minutes)"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    warning = F.when(slow, F.lit("slow_progress")).otherwise(
        F.lit(None).cast("string")
    )
    return tasks.withColumns(
        {
            "age_sec": age,
            "new_status": new_status,
            "warning": warning,
            "error": error,
        }
    )


def cap_active_tasks(tasks: DataFrame, max_active: int = 20) -> DataFrame:
    """The reference's MAX_ACTIVE_TASKS auto-complete (main.py:407-421):
    keep the ``max_active`` most recently updated active tasks active;
    auto-complete the older surplus.

    Implemented as a distributed top-k over active tasks (TakeOrderedAndProject
    on the recency order) anti-joined back — no unpartitioned window.
    """
    active = tasks.filter(F.col("new_status").isin("in_progress", "submitted"))
    keep = (
        active.orderBy(F.col("last_update").desc(), F.col("task_id").asc())
        .limit(max_active)
        .select("task_id")
    )
    demoted = active.join(F.broadcast(keep), "task_id", "left_anti").select(
        "task_id"
    )
    return tasks.join(
        F.broadcast(demoted.withColumn("__demote", F.lit(True))), "task_id", "left"
    ).withColumn(
        "new_status",
        F.when(F.col("__demote"), F.lit("completed")).otherwise(F.col("new_status")),
    ).drop("__demote")


__all__ = ["stall_detect", "cap_active_tasks", "SUBMITTED_TIMEOUT_S", "STALL_TIMEOUT_S", "WARN_AFTER_S"]
