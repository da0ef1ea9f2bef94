"""Dedup family: exact groups, n-gram Jaccard vs a pure-Python oracle,
MinHash-LSH candidate recall on planted near-dups, SimHash bucketing,
embedding cosine near-dup pairs vs numpy."""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import dedup as DD

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different words here nothing shared at all"),
    (5, "spark shuffle partition broadcast join window agg"),
    (6, "spark shuffle partition broadcast join window aggregate plus"),  # near 5
    (7, "one two"),                                        # too short for 3-shingles? (0 shingles at k=3... 0? n-2=0)
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _py_shingles(text, k=3):
    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
    return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))}


def test_exact_dup_groups(spark, docs_df):
    g = DD.exact_dup_groups(docs_df, "doc_id", "text").collect()
    assert len(g) == 1
    assert g[0]["n_dups"] == 2 and g[0]["keep_id"] == 1
    assert sorted(g[0]["dup_ids"]) == [1, 3]


def test_ngram_jaccard_matches_python(spark, docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            docs_df, "doc_id", "text", k=3, threshold=0.0
        ).collect()
    }
    for a, b in itertools.combinations([d[0] for d in DOCS], 2):
        sa, sb = _py_shingles(dict(DOCS)[a]), _py_shingles(dict(DOCS)[b])
        inter = len(sa & sb)
        if inter == 0:
            assert (a, b) not in got
        else:
            want = inter / len(sa | sb)
            assert got[(a, b)] == pytest.approx(want), (a, b)


def test_minhash_lsh_finds_planted_dups(spark, docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_candidates(
            docs_df, "doc_id", "text", k=3, num_hashes=8, bands=8
        ).collect()
    }
    # exact dup pair must always collide on every band
    assert (1, 3) in pairs
    # high-jaccard near-dups should be candidates with r=1 banding
    assert (1, 2) in pairs and (5, 6) in pairs
    # completely disjoint docs never share a minhash
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_minhash_matches_python(spark, docs_df):
    sig = DD.minhash_signatures(docs_df, "doc_id", "text", k=3, num_hashes=4)
    got = {r["doc"]: [r[f"minh_{i}"] for i in range(4)] for r in sig.collect()}
    for doc_id, text in DOCS:
        sh = _py_shingles(text)
        if not sh:
            assert doc_id not in got
            continue
        for i in range(4):
            want = min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            assert got[doc_id][i] == want


def test_simhash_buckets_group_exact_dups(spark, docs_df):
    sig = docs_df.select(
        "doc_id", DD.simhash_signature(F.col("text")).alias("s")
    ).collect()
    by_id = {r["doc_id"]: r["s"] for r in sig}
    assert by_id[1] == by_id[3]
    assert all(len(s) == 16 and set(s) <= {"0", "1"} for s in by_id.values())
    # hamming distance between near-dups is small, disjoint docs differ
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(by_id[1], by_id[2]) <= 6
    assert ham(by_id[1], by_id[4]) >= 1


def test_embedding_near_dup_vs_numpy(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(6, 8).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(8).astype("float32")  # near-dup
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in DD.embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=-1.0, bucket_col="label"
        ).collect()
    }
    for a, b in itertools.combinations(range(6), 2):
        va, vb = base[a].astype("float64"), base[b].astype("float64")
        want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert got[(a, b)] == pytest.approx(want, abs=1e-9)
    near = {p for p, c in got.items() if c >= 0.99}
    assert (0, 1) in near


def test_ngram_skew_cap_bounds_buckets(spark):
    # a stop-shingle ("aaa bbb ccc") shared by EVERY doc would make its
    # join bucket quadratic; with the cap the ubiquitous shingle is
    # dropped, pairs come only from the rarer shingles, and Jaccard is
    # computed over the capped shingle universe
    docs = [(i, f"aaa bbb ccc tail{i // 2} tail{i // 2} end{i}") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    capped = DD.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_shingle_df=5
    )
    rows = capped.collect()
    # "aaa bbb ccc" (df=20 > 5) is dropped, so no pair may owe its overlap
    # to it; pairs (2i, 2i+1) share "ccc tailK tailK"/"bbb ccc tailK" etc.
    pair_set = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert all(b - a == 1 and a % 2 == 0 for a, b in pair_set)
    assert len(pair_set) == 10
    # uncapped, every doc pairs with every other through the stop-shingle
    uncapped = DD.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_shingle_df=None
    )
    assert uncapped.count() == 20 * 19 // 2


def test_keep_latest_recrawl(spark):
    # a re-crawled URL appends a second documents row; keep_latest leaves
    # exactly the newest version per canonical_url
    rows = [
        ("http://h.test/a", 0, "old a"),
        ("http://h.test/a", 3, "new a"),
        ("http://h.test/b", 1, "only b"),
        ("http://h.test/c", 2, "old c"),
        ("http://h.test/c", 2, "same-round c"),  # tie on round
    ]
    df = spark.createDataFrame(rows, "canonical_url string, round int, text string")
    kept = {
        r["canonical_url"]: r["text"]
        for r in DD.keep_latest(
            df, ["canonical_url"], "round", tiebreak_col="text"
        ).collect()
    }
    assert kept == {
        "http://h.test/a": "new a",
        "http://h.test/b": "only b",
        "http://h.test/c": "same-round c",  # 's' > 'o' on the tiebreak
    }
    # one surviving row per key
    assert (
        DD.keep_latest(df, ["canonical_url"], "round", tiebreak_col="text")
        .groupBy("canonical_url").count().filter("count > 1").count() == 0
    )


def test_near_dup_clusters_transitive(spark):
    """Clusters are the transitive closure of the LSH pair graph: A~B and
    B~C chain into one cluster even if A and C never share a band."""
    docs = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 10
        (12, "alpha beta gamma delta epsilon zeta eta iota"),    # near 10/11
        (20, "one lonely document with entirely distinct words"),
        (30, "spark shuffle partition broadcast join window agg"),
        (31, "spark shuffle partition broadcast join window aggregate"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = {
        r["cluster_id"]: r
        for r in DD.near_dup_clusters(
            df, "doc_id", "text", k=3, num_hashes=8, bands=8
        ).collect()
    }
    # the 10/11/12 chain collapses into one cluster keyed by its min id
    assert 10 in rows
    c = rows[10]
    assert c["keep_id"] == 10 and c["n_docs"] == 3
    assert c["dup_ids"] == "10,11,12"
    # 30/31 form their own cluster; the singleton 20 is not emitted
    assert 30 in rows and rows[30]["dup_ids"] == "30,31"
    assert all(r["keep_id"] == cid for cid, r in rows.items())
    assert 20 not in {
        int(x) for r in rows.values() for x in r["dup_ids"].split(",")
    }
