"""Similarity-search operator tests: exactness vs numpy, bucket pruning,
and the high-dim query-vector path (broadcast row, not a plan literal)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import (
    similarity as SM,
)


def _vec(i: int, dim: int) -> list[float]:
    # deterministic pseudo-random unit-ish vector
    rng = np.random.default_rng(i)
    return [float(x) for x in rng.standard_normal(dim)]


@pytest.fixture(scope="module", params=[8, 1024], ids=["lowdim", "highdim"])
def embedded(request, spark):
    dim = request.param
    rows = [(i, _vec(i, dim), i % 4) for i in range(64)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    return df, dim


def _numpy_topk(rows, qvec, k):
    q = np.array(qvec)
    scored = []
    for vid, v, _ in rows:
        a = np.array(v)
        c = float(a @ q / (np.linalg.norm(a) * np.linalg.norm(q)))
        scored.append((vid, c))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_cosine_topk_matches_numpy(spark, embedded):
    df, dim = embedded
    qvec = _vec(999, dim)
    got = SM.cosine_topk(df, qvec, k=5).collect()
    rows = [(r["vec_id"], r["embedding"], r["label"]) for r in df.collect()]
    want = _numpy_topk(rows, qvec, 5)
    assert [r["id"] for r in got] == [vid for vid, _ in want]
    for r, (_, c) in zip(got, want):
        assert abs(r["cosine"] - c) < 1e-9


def test_highdim_query_vector_rides_broadcast_not_literal(spark, embedded):
    df, dim = embedded
    qvec = _vec(999, dim)
    plan = SM.cosine_topk(df, qvec, k=5)._jdf.queryExecution().executedPlan().toString()
    if dim > SM.MAX_LITERAL_DIM:
        assert "BroadcastNestedLoopJoin" in plan
        # the plan text must not inline the full vector element-wise
        assert plan.count(",") < dim
    else:
        assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_topk_prunes_and_matches(spark, embedded):
    df, dim = embedded
    qvec = _vec(7, dim)
    got = SM.bucketed_topk(df, qvec, qbucket=2, k=3).collect()
    rows = [
        (r["vec_id"], r["embedding"], r["label"])
        for r in df.filter(F.col("label") == 2).collect()
    ]
    want = _numpy_topk(rows, qvec, 3)
    assert [r["id"] for r in got] == [vid for vid, _ in want]
