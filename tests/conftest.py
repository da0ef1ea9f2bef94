from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from distributed_web_crawling_and_indexing_system_gcp_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="pytest",
        master="local[8]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def web_fixture(spark):
    """Small closed-world web: pages + robots + seeds, collected once for
    the oracle."""
    from distributed_web_crawling_and_indexing_system_gcp_spark.sources import webgen

    n_pages, n_hosts = 240, 8
    web_pages = webgen.make_web_pages(spark, n_pages, n_hosts).cache()
    robots_src = webgen.make_robots_src(spark, n_hosts).cache()
    seed_jobs = webgen.make_seed_jobs(spark, n_hosts, depth=3)
    web_rows = {r["url"]: r.asDict() for r in web_pages.collect()}
    robots_rows = {r["host"]: r["rules_txt"] for r in robots_src.collect()}
    seed_rows = [r.asDict() for r in seed_jobs.collect()]
    return {
        "web_pages": web_pages,
        "robots_src": robots_src,
        "seed_jobs": seed_jobs,
        "web_rows": web_rows,
        "robots_rows": robots_rows,
        "seed_rows": seed_rows,
        "n_pages": n_pages,
        "n_hosts": n_hosts,
    }
