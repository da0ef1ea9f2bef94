"""Distributed top-k with a dense ``rank`` column.

``df.orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` — a
distributed partial top-k (each task keeps its local k, the driver merges
k·num_partitions candidates).  A bare ``Window.orderBy(...)`` +
``row_number() <= k`` instead funnels the ENTIRE relation through one task
to evaluate the unpartitioned window — invisible at sf0.1, the scale-killer
of every search/ANN finisher at 100×.

The residual ``row_number`` window here runs over the already-limited k-row
relation (single partition of ≤k rows by construction), so it costs nothing
at any scale; the heavy input goes through TakeOrderedAndProject only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_ranked(
    df: DataFrame, order: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order`` with 1-based ``rank_col``.

    ``order`` must be a deterministic total order (include a tie-break
    key) so rank assignment is stable across runs/engines.
    """
    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # over ≤k rows — see module docstring
    return top.withColumn(rank_col, F.row_number().over(w))


__all__ = ["topk_ranked"]
