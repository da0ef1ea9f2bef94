"""Document deduplication family for the training-data pipeline surface.

Five variants, all pure DataFrame (the hash primitives are Catalyst
md5/xxhash64 expressions, so every variant below is reproducible by the
DuckDB oracle and shuffles only on compact keys):

- exact          — md5(normalized text) group-by
- n-gram Jaccard — shingle explode → self-join on shingle → pairwise
                   |A∩B| / (|A|+|B|-|A∩B|)
- MinHash + LSH  — k seeded-md5 min-hashes → b bands of r → band-bucket
                   join produces candidates without the quadratic join
- SimHash        — 16-nibble majority signature over token hashes;
                   equal signatures = near-dup bucket
- embedding      — cosine ≥ τ pairs, blocked by a bucket column (label /
                   LSH bucket) so the join is bucket-local, not quadratic

Scale notes (100 TB): the only quadratic-risk stage is pair generation;
every variant blocks it (shingle key, LSH band, bucket column).  The
shingle/band explode multiplies rows ~O(tokens), but each row is a short
hash string and the groupBy is map-side combinable.  Skewed shingles
(stopword shingles shared by everything) should be frequency-capped with
``max_shingle_df`` — the same trick as dropping stop-shingles in
production MinHash pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, norm_text, shingles, ws_tokens


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str, fingerprint=None
) -> DataFrame:
    """(fingerprint, n_dups, keep_id, dup_ids) for groups with >1 doc.

    ``fingerprint`` optionally overrides the hash expression (a Column
    over the input row) — e.g. an md5 of a normalized text prefix; the
    default is the full-text md5 fingerprint.
    """
    fp_expr = (
        fingerprint if fingerprint is not None
        else fingerprint_md5(F.col(text_col))
    )
    fp = df.select(F.col(id_col).alias("doc"), fp_expr.alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc").alias("keep_id"),
            F.sort_array(F.collect_list("doc")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc, shingle) distinct rows.

    ``array_distinct`` already dedupes within the doc and ``doc`` rows are
    unique, so the exploded rows are distinct BY CONSTRUCTION — a
    ``.distinct()`` here would be a semantic no-op costing a full shuffle
    of the widest relation in the dedup family (guide §2.4: remove
    shuffles the data's invariants make redundant)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs (doc_a < doc_b, jaccard) with shingle-Jaccard ≥ threshold.

    Join is blocked on the shingle key: only docs sharing ≥1 shingle meet.
    ``max_shingle_df`` drops ubiquitous shingles before pairing (skew cap):
    a stop-shingle shared by most docs would make its join bucket quadratic
    (df² candidate pairs).  A shingle in ≤1024 docs bounds any bucket at
    ~0.5M pairs regardless of corpus size — pass ``max_shingle_df=1024``
    (as the shipped entry/bench query does, mirrored exactly in its DuckDB
    oracle) on any large corpus.  The cap also removes capped shingles from
    the per-doc set size, i.e. Jaccard is computed over the skew-filtered
    shingle universe.  The ``None`` default keeps exact all-shingle
    semantics — the cap is an explicit opt-in, never a silent behavior
    change for callers.
    """
    # materialize the exploded shingle relation ONCE: freq, sizes and both
    # self-join sides all consume it, and an unpersisted subtree would
    # re-run the scan + tokenize + shingle explode (the heaviest string
    # work in this operator) once per consumer — the plan audit showed 7
    # copies of the explode subtree (guide §1.2 step 1: don't compute
    # things twice).  localCheckpoint is per-invocation state computed
    # from the parquet input; nothing is reused across calls.
    sh = _shingle_rows(df, id_col, text_col, k).localCheckpoint(eager=True)
    if max_shingle_df is not None:
        freq = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_df)
        sh = sh.join(freq.select("shingle"), "shingle")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        common.join(sizes.withColumnsRenamed({"doc": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """(doc, minh_0..minh_{n-1}) — lexicographic min of seeded md5 hex over
    the doc's shingle set.  md5-hex min is a valid uniform MinHash and is
    bit-identical in DuckDB (`min(md5('i|' || shingle))`).

    Deliberately the explode → groupBy(doc) → min form: the md5s evaluate
    inside the (codegen'd) partial aggregate over narrow rows.  The
    shuffle-free alternative — ``array_min(transform(shingles, md5))`` as
    a per-row map — was measured 8× SLOWER at bench scale (5.6 s vs
    0.7 s, 32-way scan): higher-order-function lambdas are interpreted
    per element, which costs far more than the one compact
    hash-partition exchange this plan keeps (guide §1.1: the "ideal"
    zero-shuffle plan lost to the measured one)."""
    sh = _shingle_rows(df, id_col, text_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"minh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 LSH band.

    band_hash = md5 over the concatenated r=num_hashes/bands minhashes;
    the pair join runs per (band_idx, band_hash) bucket — linear in
    bucket sizes, never all-pairs.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"minh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    banded = sig.select(
        "doc", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))
    # materialize once: both self-join sides consume `banded`, and the
    # signature computation (num_hashes md5 passes over every shingle) is
    # the operator's dominant cost — unpersisted, each side re-runs it
    # (per-invocation state, recomputed from the input every call)
    banded = banded.localCheckpoint(eager=True)
    a = banded.withColumnRenamed("doc", "doc_a")
    b = banded.withColumnRenamed("doc", "doc_b")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_signature(text_col, nibbles: int = 16):
    """16-nibble-majority SimHash over the distinct whitespace tokens of
    normalized text, as a '0'/'1' string column of length ``nibbles``.

    Per position i: bit = 1 iff ≥ half of the token md5 hex digits at
    position i are >= '8' (top half of the nibble range).  Pure Catalyst
    (explode-free: higher-order array functions), DuckDB-reproducible.
    """
    return _simhash_from_md5s(_token_md5s(text_col), nibbles)


def _token_md5s(text_col):
    """md5 hex of every distinct whitespace token of normalized text."""
    return F.transform(
        F.array_distinct(ws_tokens(norm_text(text_col))), lambda t: F.md5(t)
    )


def _simhash_from_md5s(md5s, nibbles: int = 16):
    """SimHash bit string from a precomputed token-md5 array column.

    Votes read the already-hashed strings, so when ``md5s`` is a
    materialized column (see :func:`simhash_buckets`) each token is hashed
    ONCE instead of once per nibble position — 16× less md5 work for
    bit-identical output (guide §1.2 step 2)."""

    def vote_merge(pos: int):
        def merge(acc, h):
            hot = (
                F.instr(F.lit("0123456789abcdef"), F.substring(h, pos, 1))
                >= F.lit(9)
            )
            return acc + F.when(hot, F.lit(1)).otherwise(F.lit(-1))

        return merge

    bits = []
    for i in range(1, nibbles + 1):
        votes = F.aggregate(md5s, F.lit(0), vote_merge(i))
        bits.append(F.when(votes >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(simhash, n_docs, doc_ids) buckets with >1 member = near-dup sets.

    Two-step projection: the token-md5 array becomes a real column first,
    so the 16 per-nibble votes read it instead of re-hashing every token
    per position (a single fused expression would be duplicated 16× by
    the planner — multi-referenced non-cheap aliases stay materialized)."""
    hashed = df.select(
        F.col(id_col).alias("doc"), _token_md5s(F.col(text_col)).alias("_md5s")
    )
    sig = hashed.select(
        "doc", _simhash_from_md5s(F.col("_md5s")).alias("simhash")
    )
    return (
        sig.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def cosine_expr(a, b):
    """cosine(a, b) for two array<float/double> columns — JVM-side
    zip_with/aggregate, computed in double."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bucket_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, cosine) with cosine ≥ threshold.

    With ``bucket_col`` the join is blocked per bucket (IVF-cell or LSH
    bucket) — the scale path.  Without it, all-pairs: only for small dims
    or already-blocked inputs.
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if bucket_col:
        cols.append(F.col(bucket_col).alias("bucket"))
    # precompute each vector's norm ONCE per row (narrow map) instead of
    # re-aggregating both norms inside every pair (guide §1.2 step 2: a
    # bucket of n vectors pays n norm passes, not n² — only the dot
    # product is inherently per-pair).  Same expression as cosine_expr's
    # norm on the same vector ⇒ bit-identical doubles.
    norm = F.sqrt(
        F.aggregate(
            F.col("vec"), F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    base = df.select(*cols).withColumn("norm", norm)
    a = base.select(*[F.col(c).alias(f"{c}_a") for c in base.columns])
    b = base.select(*[F.col(c).alias(f"{c}_b") for c in base.columns])
    on = [F.col("id_a") < F.col("id_b")]
    if bucket_col:
        on.append(F.col("bucket_a") == F.col("bucket_b"))
    pairs = a.join(b, on[0] if len(on) == 1 else (on[0] & on[1]))
    dot = F.aggregate(
        F.zip_with(
            F.col("vec_a"), F.col("vec_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = pairs.withColumn(
        "cosine", dot / (F.col("norm_a") * F.col("norm_b"))
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        F.col("id_a"), F.col("id_b"), "cosine"
    )


def keep_latest(
    df: DataFrame, key_cols: list[str], order_col: str, tiebreak_col: str | None = None
) -> DataFrame:
    """Last-write-wins upsert semantics as a batch operator: one surviving
    row per ``key_cols``, the one with the highest ``order_col``
    (``tiebreak_col`` desc breaks exact ties deterministically).

    This is the reference indexer's ES upsert keyed by URL
    (/root/reference/src/indexer/indexer_node.py:145-156) re-expressed for
    an append-only document log: re-crawling a page appends a new row and
    this operator collapses the history to the latest version.

    Scale: a window partitioned by the key — one hash shuffle on the key,
    no global ordering anywhere.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Fuzzy-dedup clusters: transitive closure of the LSH candidate graph.

    The standard LLM-corpus dedup pipeline (the shape used by C4 /
    RefinedWeb / Dolma): MinHash+LSH candidate pairs → connected
    components over the pair graph → one canonical doc per cluster.
    Returns ``(cluster_id, n_docs, keep_id, dup_ids)`` — ``cluster_id``
    and ``keep_id`` are both the cluster's minimum doc id (min-label
    components make them identical by construction); ``dup_ids`` is the
    sorted CSV of all member ids.  Singletons (docs in no candidate pair)
    are not emitted — they need no dedup decision.

    Scale: pair generation is the banded LSH bucket join (never
    all-pairs); components run min-label propagation whose round count is
    the dup-graph diameter — near-dup clusters are star/clique shaped, so
    2-3 rounds in practice.  Each round shuffles only the pair-graph
    nodes (≪ corpus size).  The reference has no near-dup notion at all
    (its dedup is an in-memory per-process visited set,
    /root/reference/src/master_node.py:208); this is the scale-path
    superset.
    """
    from .linkgraph import connected_components

    pairs = minhash_lsh_candidates(df, id_col, text_col, k, num_hashes, bands)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comps = connected_components(edges)
    return (
        comps.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("node").alias("keep_id"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("dup_ids"),
        )
    )


__all__ = [
    "exact_dup_groups",
    "keep_latest",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_signature",
    "simhash_buckets",
    "cosine_expr",
    "embedding_near_dup_pairs",
    "near_dup_clusters",
]
