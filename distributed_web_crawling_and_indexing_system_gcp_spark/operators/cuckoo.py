"""Cuckoo-filter shards — drop-in fallback for the Bloom shards.

Why a fallback exists (north star): Bloom filters cannot delete; a
long-lived crawl that re-queues or expires URLs (or compacts its seen set)
wants a filter supporting deletion and better space at low FPP.  This is a
partial-key cuckoo filter (Fan et al., CoNEXT'14 layout): 4-slot buckets,
16-bit fingerprints, two candidate buckets per key (i2 = i1 XOR hash(fp)),
with a two-choice insert + exact stash instead of kick-eviction (see
``_insert_one`` for why eviction would break exactness here).

Same shard-map interface as operators/seen.py: build over a keyed
DataFrame with vectorized numpy inside ``mapInArrow``, collect to a
``dict[shard_id -> bytes]``, broadcast, probe via a pandas UDF.  A filter
kind tag is prepended to each blob so ``filter_new`` can dispatch.

Scale notes: 16-bit fingerprints at 4 slots/bucket ⇒ ~3% theoretical FPP
worst case, ~0.1-1% at the load factors we build at (≤0.8); ~2.4 bytes/key
vs Bloom's ~1.2 bytes at 1% — the price of deletability.  False negatives
are impossible (insert failures fall back to an overflow list kept exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

SLOTS = 4


def _fingerprints(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the key's low bits."""
    fp = (h.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((h.astype(np.uint64) >> np.uint64(16)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # i2 = i1 XOR (fp * odd constant) mod n — standard partial-key trick
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(n_buckets)
    return (b.astype(np.uint64) ^ mix).astype(np.uint64) % np.uint64(n_buckets)


class _CuckooTable:
    def __init__(self, n_buckets: int):
        self.n = n_buckets
        self.table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        self.overflow: set[int] = set()

    def insert_many(self, hashes: np.ndarray) -> None:
        fps = _fingerprints(hashes)
        b1s = _bucket1(hashes, self.n)
        for h, fp, b1 in zip(hashes.tolist(), fps.tolist(), b1s.tolist()):
            if not self._insert_one(fp, b1):
                self.overflow.add(int(h))

    def _insert_one(self, fp: int, b1: int) -> bool:
        """Two-choice insert with an exact stash on overflow.

        Deliberately NO kick-eviction: a failed kick chain leaves a
        *displaced* fingerprint homeless (a false negative for a key we
        cannot reconstruct executor-side).  Two-choice placement keeps
        the exactness invariant — any key not in the table is in the
        stash — at the cost of overflowing earlier (size buckets for
        load ≤ ~0.7).
        """
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp], dtype=np.uint16), self.n)[0])
        for b in (b1, b2):
            row = self.table[b]
            if fp in row:  # already present
                return True
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False

    def to_bytes(self) -> bytes:
        ov = np.fromiter(self.overflow, dtype=np.int64, count=len(self.overflow))
        header = np.array([self.n, len(ov)], dtype=np.int64).tobytes()
        return b"CKF1" + header + self.table.tobytes() + ov.tobytes()


def parse_blob(blob: bytes):
    assert blob[:4] == b"CKF1", "not a cuckoo filter blob"
    n, n_ov = np.frombuffer(blob, dtype=np.int64, count=2, offset=4)
    off = 4 + 16
    table = np.frombuffer(
        blob, dtype=np.uint16, count=int(n) * SLOTS, offset=off
    ).reshape(int(n), SLOTS)
    off += int(n) * SLOTS * 2
    overflow = np.frombuffer(blob, dtype=np.int64, offset=off)
    return table, overflow


def contains_many(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    table, overflow = parse_blob(blob)
    n = table.shape[0]
    fps = _fingerprints(hashes)
    b1 = _bucket1(hashes, n)
    b2 = _alt_bucket(b1, fps, n).astype(np.int64)
    hit = (table[b1] == fps[:, None]).any(axis=1) | (
        table[b2] == fps[:, None]
    ).any(axis=1)
    if len(overflow):
        hit |= np.isin(hashes, overflow)
    return hit


def build_cuckoo_shards(
    seen: DataFrame, num_shards: int, buckets_per_shard: int
) -> DataFrame:
    """Same contract as seen.build_bloom_shards, cuckoo blobs instead."""

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[int, _CuckooTable] = {}
        counts: dict[int, int] = {}
        for batch in batches:
            sids = batch.column("shard_id").to_numpy(zero_copy_only=False)
            h = batch.column("url_hash").to_numpy(zero_copy_only=False)
            for sid in np.unique(sids):
                mask = sids == sid
                sid = int(sid)
                tbl = acc.setdefault(sid, _CuckooTable(buckets_per_shard))
                tbl.insert_many(h[mask])
                counts[sid] = counts.get(sid, 0) + int(mask.sum())
        for sid, tbl in acc.items():
            yield pa.RecordBatch.from_pydict(
                {
                    "shard_id": pa.array([sid], pa.int32()),
                    "bits": pa.array([tbl.to_bytes()], pa.binary()),
                    "n_keys": pa.array([counts[sid]], pa.int64()),
                }
            )

    keyed = seen.select(
        F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int").alias("shard_id"),
        "url_hash",
    ).repartition(num_shards, "shard_id")
    return keyed.mapInArrow(build, "shard_id int, bits binary, n_keys long")


def cuckoo_maybe_seen(
    spark: SparkSession,
    candidates: DataFrame,
    shards: dict[int, bytes],
    num_shards: int,
) -> DataFrame:
    bc = spark.sparkContext.broadcast(shards)

    @pandas_udf(BooleanType())
    def contains(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy(dtype=np.int64)
        sids = np.mod(h, num_shards)
        out = np.zeros(len(h), dtype=bool)
        local = bc.value
        for sid in np.unique(sids):
            blob = local.get(int(sid))
            mask = sids == sid
            if blob is None:
                continue
            out[mask] = contains_many(blob, h[mask])
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", contains(F.col("url_hash")))


def merge_shards(a: dict[int, bytes], b_keys_by_shard: dict[int, np.ndarray],
                 buckets_per_shard: int) -> dict[int, bytes]:
    """Driver-side incremental update: insert new keys into existing blobs."""
    out = dict(a)
    for sid, keys in b_keys_by_shard.items():
        if sid in out:
            table, overflow = parse_blob(out[sid])
            tbl = _CuckooTable(table.shape[0])
            tbl.table = table.copy()
            tbl.overflow = set(overflow.tolist())
        else:
            tbl = _CuckooTable(buckets_per_shard)
        tbl.insert_many(keys)
        out[sid] = tbl.to_bytes()
    return out


__all__ = [
    "build_cuckoo_shards",
    "cuckoo_maybe_seen",
    "contains_many",
    "parse_blob",
    "merge_shards",
]
