"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, compares
row-count, column names, and order-insensitive values (columns sorted by
name, rows sorted, values normalized).  Usage:

    python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from distributed_web_crawling_and_indexing_system_gcp_spark.session import (
        build_session,
    )

    spark = build_session(app_name="check_entry", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os = dict(E.queries()), dict(E.oracle_sql())
    # also verify the folded-out queries (not on the 50-entry driver
    # board, but still part of the engine's contract)
    if hasattr(E, "extra_queries"):
        qs.update(E.extra_queries())
        os.update(E.extra_oracle_sql())
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        sql = os.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            continue
        sc, sr = normalize_rows(scols, srows)
        dc, dr = normalize_rows(dcols, drows)
        if sc != dc:
            failures.append((name, f"schema {sc} vs {dc}"))
            print(f"FAIL  {name}: schema mismatch {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} vs {len(dr)}"))
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            detail = "; ".join(f"{sr[i]} vs {dr[i]}" for i in diff)
            failures.append((name, f"values differ: {detail}"))
            print(f"FAIL  {name}: values differ @rows {diff}: {detail[:300]}")
        else:
            print(f"OK    {name}: {len(sr)} rows")

    print(f"\n{len(failures)} failures / {len(qs)} queries")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
