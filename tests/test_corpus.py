"""Corpus-level scoring operators: unigram-LM NLL and recrawl priority."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import (
    corpus as CP,
)

DOCS = [
    (1, "the the the cat"),
    (2, "the cat sat"),
    (3, "zyzzyva"),          # rare token -> highest NLL
    (4, "   "),              # zero tokens -> omitted
]


def _py_nll():
    toks = {
        d: [t for t in re.split(r"\s+", txt.lower().strip()) if t]
        for d, txt in DOCS
    }
    cnt: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    total = sum(cnt.values())
    return {
        d: (
            len(ts),
            math.log(total) - sum(math.log(cnt[t]) for t in ts) / len(ts),
        )
        for d, ts in toks.items()
        if ts
    }


def test_unigram_nll_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_nll"])
        for r in CP.unigram_nll(df, "doc_id", "text").collect()
    }
    want = _py_nll()
    assert set(got) == set(want)        # doc 4 omitted on both sides
    for d, (n, nll) in want.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(round(nll, 6), abs=1e-6)
    # common-token docs score lower than the rare-token doc
    assert got[1][1] < got[3][1] and got[2][1] < got[3][1]


def test_recrawl_priority_importance_times_staleness(spark):
    ranks = spark.createDataFrame(
        [(1, 0.5), (2, 0.1), (3, 0.4)], "node long, rank double"
    )
    seen = spark.createDataFrame(
        [(1, 7200), (2, 0), (4, 0)], "node long, last_seen_epoch_s long"
    )
    rows = {
        r["node"]: r
        for r in CP.recrawl_priority(ranks, seen, now_epoch_s=10800).collect()
    }
    # inner join: node 3 (never seen) and node 4 (no rank) are absent
    assert set(rows) == {1, 2}
    assert rows[1]["priority"] == pytest.approx(0.5 * 1.0)   # 1h stale
    assert rows[2]["priority"] == pytest.approx(0.1 * 3.0)   # 3h stale
    # staleness dominates when importance is comparable
    assert rows[2]["priority"] < rows[1]["priority"]
