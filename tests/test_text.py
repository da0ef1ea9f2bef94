"""Text-analysis functions: token counts, quality components, language ID,
fingerprints — cross-checked against plain-Python computation."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.functions import text as TX

SAMPLES = [
    (1, "The quick brown fox, and the lazy dog!"),
    (2, "el la de que los es el la"),
    (3, "der die das und ist ein der"),
    (4, "xyzzy plugh qwop"),
    (5, ""),
    (6, "a  b\t c \n d"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id int, text string")


def test_token_counts(spark, df):
    rows = df.select(
        "doc_id",
        TX.token_count_ws(F.col("text")).alias("ws"),
        TX.token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()
    got = {r["doc_id"]: (r["ws"], r["bpe"]) for r in rows}
    for i, t in SAMPLES:
        ws = len([x for x in re.split(r"\s+", t) if x])
        bpe = len(re.findall(TX.BPE_TOKEN_RE, t))
        assert got[i] == (ws, bpe), (i, t)


def test_stopword_and_punct_ratio(spark, df):
    rows = df.select(
        "doc_id",
        TX.stopword_ratio(F.col("text")).alias("sr"),
        TX.punct_ratio(F.col("text")).alias("pr"),
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    # doc 1: tokens = 8, stopwords: the, and, the = 3
    assert got[1]["sr"] == pytest.approx(3 / 8)
    # doc 1 punct: ',' and '!' over 39 chars
    assert got[1]["pr"] == pytest.approx(2 / len(SAMPLES[0][1]))
    assert got[5]["sr"] == 0.0 and got[5]["pr"] == 0.0


def test_lang_id(spark, df):
    rows = df.select("doc_id", TX.lang_id(F.col("text")).alias("lg")).collect()
    got = {r["doc_id"]: r["lg"] for r in rows}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "und"


def test_quality_bounds(spark, df):
    rows = df.select(TX.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_fingerprints_match_python(spark, df):
    rows = df.select(
        "doc_id",
        TX.fingerprint_md5(F.col("text")).alias("fp"),
        TX.min_shingle_fingerprint(F.col("text"), k=3, seed=1).alias("msf"),
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    for i, t in SAMPLES:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        assert got[i]["fp"] == hashlib.md5(norm.encode()).hexdigest()
        toks = [x for x in norm.split(" ") if x]
        sh = [" ".join(toks[j : j + 3]) for j in range(max(len(toks) - 2, 0))]
        want = (
            min(hashlib.md5(f"1|{s}".encode()).hexdigest() for s in sh)
            if sh
            else None
        )
        assert got[i]["msf"] == want


def test_shingles_order_and_content(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    row = df.select(TX.shingles(F.col("text"), 3).alias("s")).collect()[0]
    assert row["s"] == ["a b c", "b c d", "c d e"]


def test_pretokenized_forms_match_fused(spark, df):
    """quality_score_from / lang_id_from over projected token arrays must
    equal the fused quality_score / lang_id exactly (the pre-tokenized
    forms exist so hot queries share ONE tokenization per row — any value
    drift would silently change oracle-checked scores)."""
    toked = df.select(
        "doc_id",
        "text",
        TX.ws_tokens(F.col("text")).alias("_toks"),
        TX.ws_tokens(F.lower(F.col("text"))).alias("_ltoks"),
    )
    rows = toked.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("q_fused"),
        TX.quality_score_from(
            F.col("text"), F.col("_toks"), F.col("_ltoks")
        ).alias("q_pre"),
        TX.lang_id(F.col("text")).alias("l_fused"),
        TX.lang_id_from(F.col("_ltoks")).alias("l_pre"),
    ).collect()
    assert rows
    for r in rows:
        assert r["q_fused"] == r["q_pre"], r["doc_id"]
        assert r["l_fused"] == r["l_pre"], r["doc_id"]
