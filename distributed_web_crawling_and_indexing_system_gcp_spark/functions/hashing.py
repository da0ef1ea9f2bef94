"""Cross-engine-stable hashing helpers.

Two families:

- ``xxhash64`` (Spark built-in, JVM-side, WSCG-friendly) — used for all
  *internal* keys: url_hash, Bloom-shard routing, salt. Fastest path; not
  reproducible in DuckDB, so never used where the SQL oracle must agree.
- md5-derived hashes — bit-identical across Spark / DuckDB / Python
  ``hashlib``; used for MinHash/SimHash/fingerprints where the driver's
  DuckDB oracle re-computes the same values.

``md5_hex(seed || '|' || s)`` as a *lexicographic* hash key avoids any
hex→int conversion differences between engines: ``min()`` over hex strings
is a valid uniform MinHash because md5 output is uniform over the hex
alphabet.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_hash(url: Column) -> Column:
    """Internal 64-bit key for canonical URLs (frontier/seen/Bloom routing)."""
    return F.xxhash64(url)


def host_salt(url: Column, salt_buckets: int) -> Column:
    """Skew salt appended to the host partition key (SURVEY.md §4)."""
    return F.pmod(F.xxhash64(url), F.lit(salt_buckets)).cast("int")


def seeded_md5(s: Column, seed: int) -> Column:
    """Hex md5 of ``'{seed}|' || s`` — identical in DuckDB:
    ``md5(concat('{seed}|', s))``."""
    return F.md5(F.concat(F.lit(f"{seed}|"), s))


def seeded_md5_py(s: str, seed: int) -> str:
    return hashlib.md5(f"{seed}|{s}".encode()).hexdigest()


def seeded_md5_sql(expr: str, seed: int) -> str:
    """DuckDB-side rendering of :func:`seeded_md5`."""
    return f"md5(concat('{seed}|', {expr}))"


__all__ = ["url_hash", "host_salt", "seeded_md5", "seeded_md5_py", "seeded_md5_sql"]
