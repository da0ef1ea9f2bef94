"""Postings build + top-k search + export pagination (SURVEY §2.6/§3.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.operators import search as SE

DOCS = [
    ("u1", "spark window merge spark spark"),
    ("u2", "window window table"),
    ("u3", "merge table scan"),
    ("u4", "nothing relevant here"),
]


@pytest.fixture(scope="module")
def postings(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    return SE.build_postings(df, "doc_id", "text").cache()


def test_postings_tf(postings):
    tf = {(r["term"], r["doc"]): r["tf"] for r in postings.collect()}
    assert tf[("spark", "u1")] == 3
    assert tf[("window", "u2")] == 2
    assert ("spark", "u2") not in tf


def test_search_topk_tf_ranking(postings):
    rows = SE.search_topk(postings, ["spark", "window"], k=3).collect()
    ranked = [(r["doc"], r["score"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # u1: 3 spark + 1 window = 4; u2: 2 window = 2
    assert ranked[0][0] == "u1" and ranked[0][1] == 4.0
    assert ranked[1][0] == "u2" and ranked[1][1] == 2.0
    assert len(ranked) == 2  # u3/u4 match no query terms


def test_search_tfidf_downweights_common_terms(spark, postings):
    rows = SE.search_topk(postings, ["table", "spark"], k=4, n_docs=4)
    got = {r["doc"]: r["score"] for r in rows.collect()}
    # 'spark' (df=1) has higher idf than 'table' (df=2)
    assert got["u1"] > got["u2"]


def test_search_bm25_matches_closed_form(spark, postings):
    """BM25 scores equal a hand-computed closed form (k1=1.2, b=0.75,
    Lucene idf) and the top-k plan stays TakeOrderedAndProject."""
    import math

    rows = SE.search_bm25(postings, ["spark", "window"], k=4).collect()
    got = {r["doc"]: r["score"] for r in rows}

    # corpus: dl u1=5, u2=3, u3=3, u4=3 → N=4, avgdl=3.5
    n, avgdl, k1, b = 4, 3.5, 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp_u1 = bm25(3, 1, 5) + bm25(1, 2, 5)  # spark df=1, window df=2
    exp_u2 = bm25(2, 2, 3)
    assert got["u1"] == pytest.approx(exp_u1, rel=1e-9)
    assert got["u2"] == pytest.approx(exp_u2, rel=1e-9)
    assert set(got) == {"u1", "u2"}

    plan = (
        SE.search_bm25(postings, ["spark"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_length_normalization(spark):
    """Same tf, same df: the shorter document must score higher (the
    length-normalization property TF/TF-IDF lack)."""
    docs = spark.createDataFrame(
        [("short", "cat dog"), ("long", "cat dog " + "filler " * 20)],
        "doc_id string, text string",
    )
    p = SE.build_postings(docs, "doc_id", "text")
    got = {r["doc"]: r["score"] for r in SE.search_bm25(p, ["cat"], k=2).collect()}
    assert got["short"] > got["long"]


def test_url_search_and_export(spark):
    seen = spark.createDataFrame(
        [(f"http://h{i % 3}.test/p/{i}",) for i in range(30)], "url string"
    )
    hits = SE.url_search(seen, "h1.test", limit=5).collect()
    assert len(hits) == 5
    assert all("h1.test" in r["url"] for r in hits)

    page = SE.export_page(seen, "url", offset=10, size=7).collect()
    all_sorted = sorted(r["url"] for r in seen.collect())
    assert [r["url"] for r in page] == all_sorted[10:17]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_postings_equal_full_rebuild(spark, tmp_path):
    """Segmented append + read-time merge == full rebuild from the latest
    document versions, across a 2-round re-crawl; compaction preserves it
    and physically drops shadowed rows."""
    idx = str(tmp_path / "seg_index")
    round0 = spark.createDataFrame(
        [("u1", "spark window merge"), ("u2", "window table"), ("u3", "scan")],
        "doc_id string, text string",
    )
    # u2 re-crawled with entirely new text (loses 'window' — the term that
    # makes doc-version resolution global, not per-bucket); u4 is new
    round1 = spark.createDataFrame(
        [("u2", "bloom filter bloom"), ("u4", "spark scan")],
        "doc_id string, text string",
    )
    SE.append_postings_segment(SE.build_postings(round0, "doc_id", "text"), idx, seg=0, num_buckets=4)
    SE.append_postings_segment(SE.build_postings(round1, "doc_id", "text"), idx, seg=1, num_buckets=4)

    latest_docs = spark.createDataFrame(
        [("u1", "spark window merge"), ("u2", "bloom filter bloom"),
         ("u3", "scan"), ("u4", "spark scan")],
        "doc_id string, text string",
    )
    full = SE.build_postings(latest_docs, "doc_id", "text")
    merged = SE.read_postings_merged(spark, idx).select("term", "doc", "tf")
    assert _rows(merged) == _rows(full)

    # stale-posting check through the pruned query path: 'window' must no
    # longer hit u2 even if u2's new terms avoid 'window's bucket
    hits = SE.search_partitioned(spark, idx, ["window"], k=10, num_buckets=4)
    assert {r["doc"] for r in hits.collect()} == {"u1"}

    SE.compact_postings(spark, idx, num_buckets=4)
    compacted = spark.read.parquet(idx)
    assert _rows(compacted.select("term", "doc", "tf")) == _rows(full)
    assert compacted.select("seg").distinct().collect()[0][0] == 0
    hits2 = SE.search_partitioned(spark, idx, ["window"], k=10, num_buckets=4)
    assert {r["doc"] for r in hits2.collect()} == {"u1"}


def test_topk_plan_is_distributed(spark, postings):
    """The top-k finisher must compile to TakeOrderedAndProject (distributed
    partial top-k), never an unpartitioned Window over the full scored
    relation (which funnels everything through one task at scale)."""
    df = SE.search_topk(postings, ["spark", "window"], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only Window allowed is the rank assignment over the ≤k-row result
    # of the limit — i.e. Window must appear ABOVE TakeOrderedAndProject in
    # the plan tree (physical plans print top-down)
    if "Window" in plan:
        assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_search_snippets_shape(spark, postings):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string").withColumn(
        "url", F.concat(F.lit("http://h.test/docs/"), F.col("doc_id"))
    )
    topk = SE.search_topk(postings, ["spark", "window"], k=3)
    out = {r["url"]: r for r in SE.search_snippets(
        topk, docs, ["spark", "window"]).collect()}
    assert set(out) == {"http://h.test/docs/u1", "http://h.test/docs/u2"}
    r1 = out["http://h.test/docs/u1"]
    assert r1["title"] == "u1"  # last path segment (UI/main.py:574)
    assert "spark" in r1["snippet"]
    assert r1["rank"] == 1

    # trailing-slash URL falls back to the full URL as title
    docs2 = docs.withColumn("url", F.concat(F.col("url"), F.lit("/")))
    out2 = {r["rank"]: r for r in SE.search_snippets(
        topk, docs2, ["spark", "window"]).collect()}
    assert out2[1]["title"] == out2[1]["url"]

    # doc with no literal term occurrence gets the reference fallback text
    topk_all = SE.search_topk(postings, ["table"], k=5)
    out3 = {r["url"]: r["snippet"] for r in SE.search_snippets(
        topk_all, docs, ["absentterm"]).collect()}
    assert all(s == "No preview available" for s in out3.values())


def test_partitioned_index_prunes_and_matches(spark, postings, tmp_path):
    path = str(tmp_path / "postings_idx")
    SE.save_postings_partitioned(postings, path, num_buckets=16)

    full = {
        (r["doc"], r["rank"])
        for r in SE.search_topk(postings, ["spark", "window"], k=5).collect()
    }
    pruned_df = SE.search_partitioned(spark, path, ["spark", "window"], k=5,
                                      num_buckets=16)
    pruned = {(r["doc"], r["rank"]) for r in pruned_df.collect()}
    assert pruned == full

    # the scan must carry a partition filter on term_bucket
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "term_bucket" in plan


# ---------------------------------------------------------------------------
# multi-field search (reference multi_match over ["content", "url"],
# UI/main.py:549-553)
# ---------------------------------------------------------------------------

def test_url_tokens_and_postings(spark):
    d = spark.createDataFrame(
        [("d1", "https://Blog.Example.COM/posts/2024/spark-tips/")],
        "doc_id string, url string",
    )
    up = SE.build_url_postings(d, "doc_id", "url")
    toks = {r["term"]: r["tf"] for r in up.collect()}
    assert toks == {
        "https": 1, "blog": 1, "example": 1, "com": 1, "posts": 1,
        "2024": 1, "spark": 1, "tips": 1,
    }


def test_multifield_ranks_url_only_match(spark):
    """A doc whose URL contains the query term but whose body does not
    must appear in the top-k (VERDICT r4 missing #2: the content-only
    scorer was blind to it)."""
    docs = spark.createDataFrame(
        [
            ("d1", "spark window merge", "https://a.test/misc/page1"),
            ("d2", "table scan filter", "https://b.test/spark/guide"),
            ("d3", "nothing relevant", "https://c.test/other/page3"),
        ],
        "doc_id string, text string, url string",
    )
    content = SE.build_postings(docs, "doc_id", "text")
    urls = SE.build_url_postings(docs, "doc_id", "url")
    out = SE.search_multifield(
        {"content": content, "url": urls}, ["spark"], k=10
    ).collect()
    hit_docs = {r["doc"] for r in out}
    assert "d2" in hit_docs  # URL-only match ranks
    assert "d1" in hit_docs
    assert "d3" not in hit_docs

    # content-only scorer (the old behavior) misses d2
    old = SE.search_bm25(content, ["spark"], k=10).collect()
    assert {r["doc"] for r in old} == {"d1"}


def test_multifield_best_fields_is_max_over_fields(spark):
    """best_fields (ES multi_match default, tie_breaker=0): the combined
    score equals the per-field BM25 max, field statistics computed
    per-field."""
    docs = spark.createDataFrame(
        [
            ("d1", "spark spark window", "https://a.test/spark"),
            ("d2", "window table", "https://b.test/spark/spark"),
        ],
        "doc_id string, text string, url string",
    )
    content = SE.build_postings(docs, "doc_id", "text")
    urls = SE.build_url_postings(docs, "doc_id", "url")
    got = {
        r["doc"]: r["score"]
        for r in SE.search_multifield(
            {"content": content, "url": urls}, ["spark", "window"], k=10
        ).collect()
    }
    cs = {r["doc"]: r["score"]
          for r in SE.bm25_doc_scores(content, ["spark", "window"]).collect()}
    us = {r["doc"]: r["score"]
          for r in SE.bm25_doc_scores(urls, ["spark", "window"]).collect()}
    for doc in got:
        expect = max(cs.get(doc, float("-inf")), us.get(doc, float("-inf")))
        assert abs(got[doc] - expect) < 1e-12
