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


def _query_vec_lit(qvec: list[float]):
    return F.array(*[F.lit(float(v)) for v in qvec])


def cosine_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine, rank) — exact top-k by cosine, deterministic tie-break
    on id asc."""
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_expr(F.col(vec_col), _query_vec_lit(qvec)).alias("cosine"),
    )
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
) -> DataFrame:
    """IVF-style pruned top-k: scan only rows whose bucket equals the
    query's coarse bucket (partition-pruned at scale)."""
    pruned = df.filter(F.col(bucket_col) == F.lit(qbucket))
    return cosine_topk(pruned, qvec, k, id_col, vec_col)


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


__all__ = ["cosine_topk", "bucketed_topk", "sign_lsh_bucket"]
