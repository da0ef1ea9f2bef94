"""Dump .explain("formatted") for declared queries to plans/r06/.

    python tools/dump_plans.py <suffix> [query ...]

Writes plans/r06/<query>_<suffix>.txt (suffix = before | after).
The crawl queries are skipped (multi-job driver loops have no single plan);
their evidence is the event-log/phase profile instead.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    suffix = sys.argv[1]
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as E
    from distributed_web_crawling_and_indexing_system_gcp_spark.session import (
        build_session,
    )

    spark = build_session(app_name="dump_plans", master="local[8]",
                          shuffle_partitions=8)
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = {**E.queries(), **E.extra_queries()}
    names = only or [
        n for n in qs if n not in ("crawl_round", "crawl_round_summary")
    ]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(name, "->", f"plans/r06/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
