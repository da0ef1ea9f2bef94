"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k for one query vector:
  broadcast the query as a literal array, score every row JVM-side
  (zip_with/aggregate — no Python), take the top-k.  O(N·d) per query;
  the correctness baseline.
- :func:`bucketed_topk` — the scale path: rows carry a coarse bucket
  (IVF cell id / cluster label / LSH sign-bucket); the scan is pruned to
  the query's bucket (plus optional probes).  Same scoring code.
- :func:`sign_lsh_bucket` — deterministic hyperplane-sign bucket from
  seeded md5-derived pseudo-random projections, for inputs without a
  precomputed cell id.

At 100 TB the win is partition pruning: store vectors partitioned by
bucket so a query touches |probes|/|buckets| of the data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_expr
from .topk import topk_ranked


# Above this dimensionality the query vector no longer compiles into the
# plan as an element-wise literal (which bloats the expression tree at
# 1024d+); it rides a broadcast 1-row DataFrame instead.
MAX_LITERAL_DIM = 256


def _query_vec_lit(qvec: list[float]):
    return F.array(*[F.lit(float(v)) for v in qvec])


def _with_query_vec(df: DataFrame, qvec: list[float], col: str = "_qvec"):
    """Attach the query vector as column ``col``: an array literal at low
    dim, a broadcast single-row cross join at high dim (plan stays free of
    thousand-element literals; BroadcastNestedLoopJoin over 1 row is
    free)."""
    if len(qvec) <= MAX_LITERAL_DIM:
        return df.withColumn(col, _query_vec_lit(qvec))
    qdf = df.sparkSession.createDataFrame(
        [([float(v) for v in qvec],)], f"{col} array<double>"
    )
    return df.crossJoin(F.broadcast(qdf))


def cosine_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """(id, cosine, rank) — exact top-k by cosine, deterministic tie-break
    on id asc.  ``round_to`` rounds the score BEFORE ranking (cross-engine
    stable tie-breaks for the oracle)."""
    with_q = _with_query_vec(df, qvec)
    score = cosine_expr(F.col(vec_col), F.col("_qvec"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = with_q.select(F.col(id_col).alias("id"), score.alias("cosine"))
    return topk_ranked(
        scored, [F.col("cosine").desc(), F.col("id").asc()], k
    ).select("id", "cosine", "rank")


def bucketed_topk(
    df: DataFrame,
    qvec: list[float],
    qbucket,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    round_to: int | None = None,
) -> DataFrame:
    """IVF-style pruned top-k: scan only rows whose bucket equals the
    query's coarse bucket (partition-pruned at scale)."""
    pruned = df.filter(F.col(bucket_col) == F.lit(qbucket))
    return cosine_topk(pruned, qvec, k, id_col, vec_col, round_to=round_to)


def _project_bucket(qvec: list[float], planes: int, seed: int) -> int:
    """Driver-side sign bucket of one query vector (same hyperplanes as
    ``sign_lsh_bucket``)."""
    b = 0
    for i, plane in enumerate(_hyperplane(seed, planes, len(qvec))):
        dot = sum(float(x) * y for x, y in zip(qvec, plane))
        if dot >= 0:
            b |= 1 << i
    return b


def sign_lsh_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 7,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
    round_to: int | None = None,
) -> DataFrame:
    """Multi-probe sign-LSH ANN: score only rows whose LSH bucket is the
    query's bucket or within Hamming distance covered by ``probes``.

    probes=1 → exact-bucket only (1/2^planes of the data); probes=1+p
    additionally flips the p "least confident" bits one at a time —
    the standard multi-probe LSH recall/coverage dial.  ``df`` must
    already carry ``bucket_col`` (``sign_lsh_bucket``); at 100 TB the
    table is partitioned by it, so the IN-filter is partition pruning,
    not a scan.
    """
    qb = _project_bucket(qvec, planes, seed)
    # flip order: planes whose projection magnitude is smallest are the
    # least confident signs → their flips are the best probe candidates
    mags = []
    for i, plane in enumerate(_hyperplane(seed, planes, len(qvec))):
        dot = sum(float(x) * y for x, y in zip(qvec, plane))
        mags.append((abs(dot), i))
    flips = [i for _, i in sorted(mags)]
    buckets = [qb] + [qb ^ (1 << i) for i in flips[: max(probes - 1, 0)]]
    pruned = df.filter(F.col(bucket_col).isin(sorted(set(buckets))))
    return cosine_topk(pruned, qvec, k, id_col, vec_col, round_to=round_to)


def _hyperplane(seed: int, planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bytes → [-1, 1]."""
    out = []
    for p in range(planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}|{p}|{ctr}".encode()).digest()
            vals.extend(b / 127.5 - 1.0 for b in h)
            ctr += 1
        out.append(vals[:dim])
    return out


def sign_lsh_bucket(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Adds an int bucket = sign bits of ``planes`` random projections.

    Projections are JVM-side zip_with/aggregate sums; the hyperplanes are
    tiny literals compiled into the plan (no broadcast needed).
    """
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplane(seed, planes, dim)):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col), F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket.cast("int"))


__all__ = [
    "MAX_LITERAL_DIM",
    "cosine_topk",
    "bucketed_topk",
    "sign_lsh_bucket",
    "sign_lsh_topk",
]
