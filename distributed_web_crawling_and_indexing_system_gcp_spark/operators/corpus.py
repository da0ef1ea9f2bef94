"""Corpus-level statistical quality scoring for the training-data surface.

The reference indexes raw extracted text with no quality model at all
(/root/reference/src/indexer/indexer_node.py:145-156 stores `content`
verbatim); a production LLM-data pipeline filters documents by language-
model perplexity before training (the CCNet recipe: score each document
with an LM and keep the low-perplexity head).  The honest no-extra-deps
variant here is a *self-trained unigram LM*: token probabilities are the
corpus' own token frequencies, and a document's score is its mean
negative log-likelihood under that LM.  Repetitive / templated documents
made of globally-common tokens score low (kept); documents of rare junk
tokens score high (dropped).

Scale notes (100 TB): the LM "training" is one map-side-combinable
groupBy over exploded tokens (the same shuffle shape as the postings
build); the vocabulary table is tiny relative to the corpus (natural-
language vocab grows ~O(corpus^0.5), Heaps' law) so the score join is
AQE-broadcastable for real vocabularies and degrades to a shuffle-hash
join on the token key beyond that — never all-pairs, never driver-side.
The total-token count rides along as a one-row broadcast cross join, not
a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_text, ws_tokens


def unigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus' own
    unigram LM: ``nll(d) = ln(T) - mean_{t in d} ln(count(t))`` where
    ``count`` is the corpus token frequency and ``T`` the total token
    count.  (Algebraically identical to ``mean -ln(count(t)/T)`` but
    keeps the scalar out of the per-token loop.)

    Returns ``(id_col, n_tokens, mean_nll)``; documents with zero tokens
    are omitted (no likelihood is defined for them).  Tokens are the
    whitespace tokens of normalized text — the same tokenization as the
    dedup/fingerprint family, so the oracle SQL reproduces it exactly.
    """
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(norm_text(F.col(text_col)))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t_total"))
    per_doc = (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log("c")).alias("_avg_ln_c"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        F.round(F.log("t_total") - F.col("_avg_ln_c"), round_to).alias("mean_nll"),
    )


def recrawl_priority(
    ranks: DataFrame,
    last_seen: DataFrame,
    now_epoch_s: int,
    round_to: int = 6,
) -> DataFrame:
    """Recrawl scheduling score: ``priority = rank × age_hours``.

    The classic importance-×-staleness recrawl policy (Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
    TODS'03): pages that are both important (PageRank) and stale (long
    since last fetch) are re-fetched first.  ``ranks`` is ``(node,
    rank)``; ``last_seen`` is ``(node, last_seen_epoch_s)``.  Inner join —
    never-seen pages are scheduled by the frontier, not the recrawler.

    One broadcast-or-shuffle join on the node key; the rank table is the
    page dimension, trivially partitionable at frontier scale.
    """
    age_h = (F.lit(now_epoch_s) - F.col("last_seen_epoch_s")) / F.lit(3600.0)
    return (
        ranks.join(last_seen, "node")
        .select(
            "node",
            "rank",
            "last_seen_epoch_s",
            F.round(F.col("rank") * age_h, round_to).alias("priority"),
        )
    )


__all__ = ["unigram_nll", "recrawl_priority"]
