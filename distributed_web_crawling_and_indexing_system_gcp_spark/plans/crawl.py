"""Crawl-round logical plan + driver round loop.

One crawl **round** is one deterministic Spark job over the frontier
(SURVEY.md §3.1 "engine equivalent").  The reference's master⇄crawler
Pub/Sub loop (/root/reference/src/master/master_node.py:155-282 and
/root/reference/src/crawler/crawler_node.py:224-388) becomes:

    pending frontier
      → per-host politeness window (budget; overflow deferred)
      → global seen-set dedup (canonical url_hash)
      → robots gate (broadcast rules join + vectorized RobotFileParser)
      → fetch (synthetic closed-world join; network stage stubbed)
      → parse_html → interleaved spans → documents rows
      → posexplode links → clean → urljoin → validity → canonicalize
        → domain restriction (case-sensitive SUBSTRING, crawler_node.py:363)
        → depth gate → dedup vs seen → new pending frontier rows
      → metrics (per-partition lineage) → atomic snapshot commit

Determinism contract (what the pytest oracle mirrors exactly):
- frontier order = (depth asc, url asc) within each host's budget window;
- seen adds happen (a) when a row is selected for fetch — BEFORE the
  robots gate, matching crawler_node.py:253-268 where a robots-blocked
  URL still enters the seen set — and (b) when a link is extracted
  (crawler_node.py:361-365);
- children are enqueued in canonical form (crawler_node.py:366) with
  depth+1, inheriting task_id / depth_limit / domain_restriction
  (master_node.py:236-248, is_continuation path);
- timeout ⇒ retryable while attempts < max_attempts (reference nacks for
  redelivery, crawler_node.py:278-281); other errors ⇒ terminal failure;
- extraction-batch duplicates resolve to min (depth, parent_url, link_pos).

Scale shape: every stage is a narrow map or a key-partitioned shuffle on
(host[, salt]) or url_hash; the only driver materialization is the
pending-row count per round and the (MB-sized) Bloom shard map.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import urls as U
from ..functions.html import links_view, parse_html_udf, text_view
from ..operators import politeness, robots, seen as seen_ops
from ..sources.fetch import classify_fetch, fetch_synthetic
from ..sources.snapshots import SnapshotStore

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("depth_limit", T.IntegerType()),
        T.StructField("task_id", T.StringType()),
        T.StructField("domain_restriction", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("round_added", T.IntegerType()),
        T.StructField("round_processed", T.IntegerType()),
    ]
)

SEEN_SCHEMA = "url_hash long, url string"

DOCUMENTS_SCHEMA = (
    "doc_id string, canonical_url string, task_id string, depth int, round int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "text string, html string"
)

METRICS_SCHEMA = (
    "node_type string, event string, task_id string, url string, count long, "
    "partition_id int, round int"
)

# distinguishes scratch dirs of multiple run_crawl calls; itertools.count's
# next() is atomic under the GIL, so threads racing run_crawl in one session
# can never draw the same suffix (ADVICE r3)
import itertools as _itertools

_RUN_SEQ = _itertools.count(1)


@dataclass
class CrawlConfig:
    max_depth: int = 3                  # reference MAX_DEPTH default
    politeness_budget: int = 8          # per host per round (north rule)
    salt_buckets: int = 4               # host-salt skew factor
    max_attempts: int = 3               # timeout retries (T2)
    bloom_shards: int = 16
    bloom_bits_per_shard: int = 1 << 18
    use_bloom: bool = True
    filter_kind: str = "bloom"  # "bloom" | "cuckoo" (deletable fallback)
    max_rounds: int = 64
    # per-round seen-delta sizes up to this collect driver-side for the
    # numpy Bloom insert; above it the distributed build_bloom_shards +
    # or_shards path runs instead (a breadth-y round at 10^10-URL scale
    # can add billions of keys — collecting those would OOM the driver)
    bloom_delta_collect_max: int = 2_000_000
    # distinct-host count up to which robots rules accumulate in a driver
    # list (re-broadcast each round); above it the rules stay a
    # checkpointed DataFrame (10^7+ hosts × multi-KB rules_txt would
    # otherwise be rebuilt and re-serialized from the driver every round)
    robots_driver_max: int = 100_000
    extra: dict = field(default_factory=dict)


def seeds_to_frontier(spark: SparkSession, seed_jobs: DataFrame) -> DataFrame:
    """Expand seed jobs into round-0 pending frontier rows.

    Mirrors the master's seed path (master_node.py:254-275): depth=0,
    depth_limit=job depth, task_id=job task_id.  The UI's duplicate-seed-
    set job dedup (UI/main.py:185-199) is applied upstream by
    ``dedupe_seed_jobs``.  Invalid (non-http) seeds are dropped like the
    crawler's validity guard (crawler_node.py:248-251).
    """
    rows = seed_jobs.select(
        F.explode("seed_urls").alias("raw_url"),
        F.col("task_id"),
        F.col("depth").alias("depth_limit"),
        F.col("domain_restriction"),
    )
    # one seed job = one input row ⇒ the exploded URLs land in one
    # partition; spread them so the canonicalize/host UDFs parallelize
    rows = rows.repartition(spark.sparkContext.defaultParallelism)
    cleaned = rows.withColumn("url", U.clean_col(F.col("raw_url"))).filter(
        U.is_valid_http(F.col("url"))
    )
    out = (
        cleaned.withColumn("canonical_url", U.canonicalize_udf(F.col("url")))
        .withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
        .withColumn("host", F.lower(U.host_udf(F.col("url"))))
        .withColumn("depth", F.lit(0))
        .withColumn("status", F.lit("pending"))
        .withColumn("attempts", F.lit(0))
        .withColumn("round_added", F.lit(0))
        .withColumn("round_processed", F.lit(None).cast("int"))
    )
    return out.select([f.name for f in FRONTIER_SCHEMA.fields])


def validate_seed_jobs(seed_jobs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Ingest guards (F9) — the master's message validation re-expressed
    for a job table (master_node.py:158-200: empty message, bad JSON,
    missing task_id, unreadable payload all ack-and-drop; :255-260 null
    depth falls back to the default limit).

    Returns ``(valid, rejected)``; ``rejected`` carries a ``reject_reason``
    column so the caller can route it to a dead-letter sink the way the
    reference logs-and-acks.  Null depth is repaired (default 3), not
    rejected, matching the reference's lenient default.
    """
    reason = (
        F.when(
            F.col("task_id").isNull() | (F.trim(F.col("task_id")) == ""),
            F.lit("missing_task_id"),
        )
        .when(
            F.col("seed_urls").isNull() | (F.size(F.col("seed_urls")) == 0),
            F.lit("empty_seed_set"),
        )
        .when(F.col("depth") < 0, F.lit("invalid_depth"))
        .otherwise(F.lit(None).cast("string"))
    )
    flagged = seed_jobs.withColumn("reject_reason", reason)
    valid = (
        flagged.filter(F.col("reject_reason").isNull())
        .drop("reject_reason")
        .withColumn("depth", F.coalesce(F.col("depth"), F.lit(3)))
    )
    rejected = flagged.filter(F.col("reject_reason").isNotNull())
    return valid, rejected


def dedupe_seed_jobs(seed_jobs: DataFrame) -> DataFrame:
    """UI-level duplicate-job collapse: jobs with the same sorted seed-URL
    set reuse the earliest task (UI/main.py:185-199, J5)."""
    sig = seed_jobs.withColumn(
        "_sig", F.array_join(F.sort_array(F.col("seed_urls")), ",")
    )
    first = sig.groupBy("_sig").agg(F.min("task_id").alias("task_id"))
    return (
        sig.join(first, ["_sig", "task_id"])  # keep only the first job per sig
        .drop("_sig")
    )


def _empty(spark: SparkSession, schema) -> DataFrame:
    return spark.createDataFrame([], schema)


def _extract_links(ok_html: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """ok_html: fetched rows + parsed column; returns candidate child rows
    (pre seen-dedup).  Columns: canonical child url/host/hash + lineage +
    dedup-ordering keys (_depth,_parent,_pos)."""
    eff_limit = F.coalesce(F.col("depth_limit"), F.lit(cfg.max_depth))
    expandable = ok_html.filter(F.col("depth") < eff_limit)

    links = expandable.select(
        F.col("canonical_url").alias("parent_canonical"),
        F.col("task_id"),
        F.col("depth"),
        F.col("depth_limit"),
        F.col("domain_restriction"),
        F.coalesce(F.col("final_url"), F.col("url")).alias("base_url"),
        F.posexplode(links_view(F.col("spans"))).alias("link_pos", "href"),
    )
    # ONE fused Arrow pass: urljoin + urlparse + canonicalize.  A guarded
    # pure-Catalyst fast path for simple absolute links exists
    # (U.resolve_and_parse_expr, equivalence-tested) but was measured
    # 15-25 % SLOWER end-to-end in interleaved A/Bs — the Python resolve
    # of the link stream is cheap and pipelined, while the guard/struct
    # expressions multiply across this projection's many consumers —
    # so the plain fused UDF stays (guide §1.1: measure, don't assume).
    resolved = links.withColumn(
        "_rp", U.resolve_and_parse_udf(F.col("base_url"), F.col("href"))
    )
    parsed = resolved.select(
        "*",
        F.col("_rp.scheme").alias("scheme"),
        F.col("_rp.netloc").alias("netloc"),
        F.col("_rp.canonical").alias("canonical_url"),
    ).filter(U.is_schemed_http(F.col("scheme"), F.col("netloc")))
    # substring (NOT suffix) domain restriction, case-sensitive on the
    # non-normalized netloc (crawler_node.py:363)
    restricted = parsed.filter(
        F.col("domain_restriction").isNull()
        | F.col("netloc").contains(F.col("domain_restriction"))
    )
    return (
        restricted.drop("_rp")
        .withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
        .withColumn("child_depth", F.col("depth") + F.lit(1))
    )


def run_round(
    spark: SparkSession,
    round_no: int,
    frontier: DataFrame,
    seen: DataFrame,
    robots_rules: DataFrame,
    web_pages: DataFrame,
    robots_src: DataFrame,
    cfg: CrawlConfig,
    bloom: dict[int, bytes] | None = None,
    scratch: str | None = None,
    pending_hint: int | None = None,
) -> dict[str, DataFrame]:
    """Execute one crawl round; returns the post-round tables (lazy DFs).

    ``pending_hint``: exact count of retryable frontier rows entering this
    round, when the caller knows it (run_crawl derives it from last
    round's collected metrics: deferred + retryable timeouts + new URLs).
    Used only to skip provably-identity work; None = unknown.

    ``robots_src(host, rules_txt)`` is the closed-world robots fixture —
    hosts absent from it are "fetch failed ⇒ permissive" (null rules).

    ``scratch``: directory for the round's fetch-result materialization as
    PARQUET instead of a row-serialized localCheckpoint.  The fetch result
    is ~95% html+spans by bytes but most consumers (six status branches,
    metrics) need only the narrow frontier columns — columnar storage
    gives them column pruning, so only the documents/link branches pay for
    the heavy payload.  On a cluster this is exactly an Iceberg/Delta
    round-state table on local SSD/object storage.
    """
    # opt-in phase profiling: cfg.extra["phase_log"] is a caller-owned list
    # that collects (round_no, phase, seconds) for the serial-fraction
    # audit (tools/profile_serial.py); absent in normal runs = zero cost
    import time as _time

    _phase_log = cfg.extra.get("phase_log")
    _t_round0 = _time.perf_counter()

    def _phase(name: str, t0: float) -> float:
        now = _time.perf_counter()
        if _phase_log is not None:
            _phase_log.append((round_no, name, now - t0))
        return now

    retryable = (F.col("status") == "pending") | (
        (F.col("status") == "timeout") & (F.col("attempts") < cfg.max_attempts)
    )
    pending = frontier.filter(retryable)
    settled = frontier.filter(~retryable)

    # -- politeness window: ≤ budget rows per host this round ---------------
    # persisted: deferred, first_timers, retries, and skipped_seen all
    # branch off this subtree — without the persist the window shuffles
    # (and everything upstream) re-execute once per consumer.
    # Short-circuit: when the driver already knows the TOTAL pending count
    # (from last round's collected metrics) and it is ≤ the per-host
    # budget, no host can exceed its budget, so selection is the identity —
    # the two window shuffles (and their stage-scheduling latency, the
    # dominant cost of small retry-only rounds) are skipped.  Selection
    # semantics are unchanged: all rows selected, deferred empty, exactly
    # what the windowed form returns for any under-budget round.
    if pending_hint is not None and pending_hint <= cfg.politeness_budget:
        windowed = pending.withColumn("selected", F.lit(True))
    else:
        windowed = politeness.select_polite_batch(
            pending,
            budget=cfg.politeness_budget,
            salt_buckets=cfg.salt_buckets,
            order_cols=("depth", "url", "task_id"),
        ).persist()
    deferred = windowed.filter(~F.col("selected")).drop("selected")
    batch = windowed.filter(F.col("selected")).drop("selected")

    # -- selection-time dedup ------------------------------------------------
    # The reference's pre-fetch seen check (crawler_node.py:253-258) guards
    # against the SAME task being delivered/processed twice.  In the global
    # engine, enqueue-time dedup (extraction below) already keeps the
    # pending frontier unique among never-processed URLs, so the selection
    # check compares against *processed* canonicals only (duplicate seeds
    # across jobs, re-deliveries) — NOT against the full enqueued-seen set,
    # which would wrongly skip every child the frontier itself scheduled.
    # Timeout retries bypass the check (T2 re-delivery of an owned task).
    first_timers = batch.filter(F.col("status") == "pending")
    retries = batch.filter(F.col("status") != "pending")
    # right side of a left_anti needs no distinct — skip the extra shuffle
    processed = frontier.filter(F.col("round_processed").isNotNull()).select(
        "url_hash"
    )
    new_batch = first_timers.join(processed, "url_hash", "left_anti")
    skipped_seen = first_timers.join(
        new_batch.select("url_hash"), "url_hash", "left_anti"
    )
    # same-batch canonical duplicates: keep (depth, url, task_id) min
    new_batch = new_batch.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("url_hash").orderBy("depth", "url", "task_id")
        ),
    )
    batch_dups = new_batch.filter(F.col("_rn") > 1).drop("_rn")
    new_batch = new_batch.filter(F.col("_rn") == 1).drop("_rn")
    skipped_seen = skipped_seen.unionByName(batch_dups)

    # new_batch feeds the robots gate, the seen update, metrics, AND the
    # skipped_seen anti-join — persist so the window+anti-join subtree
    # runs once per round, not once per consumer
    new_batch = new_batch.persist()

    # seen grows by every selected-for-processing canonical — BEFORE the
    # robots gate (crawler_node.py:256-258 precedes :264).  Children are
    # already in seen (added at enqueue), so the genuine additions are the
    # batch keys NOT in seen (≈ the seed rows) — an anti-join over the
    # small batch instead of a dropDuplicates shuffle over the full seen.
    batch_adds = new_batch.select(
        "url_hash", F.col("canonical_url").alias("url")
    ).join(seen.select("url_hash"), "url_hash", "left_anti")
    seen_after_batch = seen.unionByName(batch_adds)

    # -- robots: fetch-once-per-new-host, then broadcast-join gate ----------
    to_fetch = new_batch.unionByName(retries)
    need = robots.missing_hosts(to_fetch, robots_rules)
    fetched_rules = need.join(robots_src, "host", "left").select(
        "host", "rules_txt"
    )  # host missing from robots_src ⇒ null rules ⇒ permissive
    # `need` is anti-joined against robots_rules ⇒ disjoint; plain union
    robots_after = robots_rules.unionByName(fetched_rules)

    gated = robots.gate_on_robots(to_fetch, robots_after)
    blocked = gated.filter(~F.col("robots_allowed")).drop("robots_allowed")
    allowed = gated.filter(F.col("robots_allowed")).drop("robots_allowed")

    # -- fetch (closed world) + parse, materialized ONCE --------------------
    # fetched rows fan out to documents, link extraction, metrics and four
    # frontier-status branches.  ONE eager DISK_ONLY checkpoint holds the
    # round's fetch results + parsed spans: the fetch join runs once, the
    # parse UDF runs once, and the heavy (html, spans) columns serialize
    # once, off-heap.  (A deserialized in-memory persist of span-struct
    # arrays bloats ~10× and gets evicted under load — the re-parse that
    # follows was measured at >600 core-s per round at bench scale.)
    # Non-HTML/error rows carry html=null ⇒ parse yields null spans.
    from pyspark.storagelevel import StorageLevel

    # fetch route: the closed-world fixture join (tests/bench — no Python
    # in the path) or, when cfg.extra["fetcher"] injects a request
    # callable, the REAL production stage — grouped applyInPandas per
    # (host, salt) with within-task pacing (sources/fetch.py)
    if cfg.extra.get("fetcher") is not None:
        from ..sources.fetch import fetch_over_network

        salted = allowed.withColumn(
            "host_salt",
            F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets)).cast("int"),
        )
        raw_fetched = fetch_over_network(
            salted,
            min_interval_s=cfg.extra.get("fetch_min_interval", 1.0),
            fetcher=cfg.extra["fetcher"],
            pacer=cfg.extra.get("fetch_pacer"),
        ).drop("host_salt")
    else:
        raw_fetched = fetch_synthetic(allowed, web_pages)
    # parse a MASKED column: only ok_html bodies of EXPANDABLE rows reach
    # the HTML parser in the hot fetch stage —
    # - non-HTML 2xx bodies (PDFs etc.) would burn parser time for
    #   nothing with a production fetcher;
    # - pages already AT their depth limit never feed link extraction
    #   (guide §1.2: don't compute what you throw away — at max_depth=1
    #   that is HALF the fetched pages), so their spans are derived
    #   lazily by the documents sink below, only if a caller
    #   materializes documents.  Opt out: extra["lazy_parse"]=False.
    _eff_limit = F.coalesce(F.col("depth_limit"), F.lit(cfg.max_depth))
    if cfg.extra.get("lazy_parse", True):
        _parse_mask = (F.col("fetch_outcome") == "ok_html") & (
            F.col("depth") < _eff_limit
        )
    else:
        _parse_mask = F.col("fetch_outcome") == "ok_html"
    fetched_lazy = classify_fetch(raw_fetched).withColumn(
        "spans", parse_html_udf(F.when(_parse_mask, F.col("html")))
    )
    _t = _phase("plan_build_prefetch", _t_round0)
    # NARROW round state (VERDICT r5 #2 / guide §8: "make every shuffle
    # but the last operate on a lightweight proxy"): with the closed-world
    # synthetic fetcher the raw ``html`` bodies are deterministically
    # re-derivable from ``web_pages`` by request URL, so the round-state
    # parquet — which every post-parse consumer reads — omits the heaviest
    # column entirely; ``documents`` re-attaches html with one lazy join
    # that only executes if a caller materializes the documents sink.
    # With an injected production fetcher bodies are NOT refetchable and
    # stay inline.  Opt out with extra["narrow_round_state"]=False.
    drop_html = (
        scratch is not None
        and cfg.extra.get("fetcher") is None
        and cfg.extra.get("narrow_round_state", True)
    )
    if scratch is not None:
        # columnar round state: the six status branches + metrics prune to
        # the narrow frontier columns; only documents/link extraction read
        # the heavy spans column chunks
        path = f"{scratch}/fetched_r{round_no:05d}"
        state_out = fetched_lazy.drop("html") if drop_html else fetched_lazy
        state_out.write.mode("overwrite").parquet(path)
        fetched = spark.read.parquet(path)
    else:
        fetched = fetched_lazy.localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
    _t = _phase("fetch_materialize", _t)
    ok_html = fetched.filter(F.col("fetch_outcome") == "ok_html")

    # -- documents: one row per fetched HTML page ---------------------------
    doc_src = ok_html
    if drop_html:
        # re-attach bodies from the closed-world fixture: the fetch join
        # keyed html by the exact request url, so this reproduces the
        # dropped column bit-for-bit (left join — every ok_html row came
        # from a fixture hit by construction)
        doc_src = ok_html.join(
            web_pages.select("url", "html"), "url", "left"
        )
    # spans for at-depth-limit pages were skipped in the fetch stage (see
    # _parse_mask): derive them here, lazily, from the (re-attached) html
    # — parse_html_udf is deterministic, so the lazy spans are identical
    # to eagerly-parsed ones (pinned by test_span_sequence_equality, which
    # covers documents at the depth limit).  The two-step projection keeps
    # the parse UDF evaluated once per row (spans + text both read the
    # projected column).
    doc_src = doc_src.withColumn(
        "_spans_full",
        F.coalesce(
            F.col("spans"),
            parse_html_udf(
                F.when(F.col("spans").isNull(), F.col("html"))
            ),
        ),
    )
    documents = doc_src.select(
        F.coalesce(F.col("final_url"), F.col("url")).alias("doc_id"),
        F.col("canonical_url"),
        F.col("task_id"),
        F.col("depth"),
        F.lit(round_no).alias("round"),
        F.col("_spans_full").alias("spans"),
        text_view(F.col("_spans_full")).alias("text"),
        F.col("html"),
    )

    # -- link extraction → new frontier rows --------------------------------
    # enqueue-time global dedup: Bloom "definitely new" fast path + exact
    # anti-join confirm against the full enqueued-seen set (F2/F3 at scale)
    candidates = _extract_links(ok_html, cfg)
    # persist is LOAD-BEARING for scaling (same family as `fresh` below):
    # filter_new splits into definitely-new ∪ (maybe ⋈ anti seen) — TWO
    # union branches over this subtree.  Unpersisted, each branch re-runs
    # the round's heaviest chain (fetched-parquet html decompress → span
    # link explode → fused resolve/canonicalize Arrow UDF) from the scan
    # up; event-log task accounting at 120k pages showed both warm-up
    # stages reading the full fetched parquet (27.5k rows/task each —
    # the chain executed twice per round).  The exploded-candidate rows
    # are NARROW (urls + lineage keys, no html/spans), so caching them is
    # cheap relative to one extra decompress+explode+UDF pass.
    candidates = candidates.persist()
    if cfg.use_bloom and bloom is not None:
        # the shard map was built from round-start `seen`, so run the Bloom
        # fast path against that set, then an exact anti-join against this
        # round's (small) batch additions which the shards don't cover yet
        fresh = seen_ops.filter_new(
            candidates, seen, bloom, cfg.bloom_shards, cfg.bloom_bits_per_shard
        ).join(new_batch.select("url_hash"), "url_hash", "left_anti")
    else:
        fresh = seen_ops.filter_new(candidates, seen_after_batch)
    dedup_w = Window.partitionBy("url_hash").orderBy(
        "child_depth", "parent_canonical", "link_pos"
    )
    # persist is LOAD-BEARING for scaling: fresh (link explode →
    # canonicalize UDF → Bloom → dedup window, the round's most expensive
    # chain) fans out to new_frontier, seen_delta AND the metrics branch
    # of the state union.  Column pruning specializes each branch's copy
    # of the subtree, so exchange reuse does NOT dedupe them — without a
    # cache the chain executes once per AQE leaf stage (measured 3.3×
    # JVM-CPU inflation at local[8] vs local[2] on the 20k fixture).
    fresh = (
        fresh.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    ).persist()
    # Cache-chain warm-up: one linear count that populates the
    # windowed→new_batch→fresh persisted subtrees in dependency order
    # before the multi-branch round materialization, so concurrent AQE
    # leaf stages read the cache instead of racing to recompute it.
    # Historically keyed on parallelism ≥ 16 (before `fresh` was
    # persisted the count was thrown away and only paid off when the
    # local[32] stage race bit).  With `fresh` persisted the warm-up
    # wins at every level (20k-page A/B, fresh JVMs: local[2] 102 s vs
    # 115 s, local[8] 60 s vs 79 s — and the unpersisted r4 baseline was
    # 170/90 s).  Overridable via extra["warmup"].
    warmup = cfg.extra.get("warmup")
    if warmup is None:
        # skip the warm-up JOB (but keep the persist) on provably-small
        # retry rounds: when the batch fits under the per-host budget the
        # chain a racing consumer would recompute is tiny, and the saved
        # job submission (~2-3 s) is pure serial-fraction reduction
        warmup = not (
            pending_hint is not None
            and pending_hint <= cfg.politeness_budget
        )
    if warmup:
        _t = _phase("plan_build_mid", _t)
        fresh.count()
        _t = _phase("warmup_count", _t)
    new_frontier = fresh.select(
        F.col("canonical_url").alias("url"),  # children enqueue normalized
        F.col("canonical_url"),
        F.col("url_hash"),
        U.host_col(F.col("canonical_url")).alias("host"),
        F.col("child_depth").alias("depth"),
        F.col("depth_limit"),
        F.col("task_id"),
        F.col("domain_restriction"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("attempts"),
        F.lit(round_no + 1).alias("round_added"),
        F.lit(None).cast("int").alias("round_processed"),
    )

    # `fresh` is anti-joined vs seen AND vs batch_adds ⇒ disjoint; union
    seen_delta = batch_adds.unionByName(
        new_frontier.select("url_hash", F.col("canonical_url").alias("url"))
    )
    seen_final = seen.unionByName(seen_delta)

    # -- frontier state update ----------------------------------------------
    def finish(df: DataFrame, status: str, bump_attempts: bool = False) -> DataFrame:
        out = df.select(*[f.name for f in FRONTIER_SCHEMA.fields if f.name not in ("status", "attempts", "round_processed")],
                        "attempts")
        out = out.withColumn("status", F.lit(status)).withColumn(
            "round_processed", F.lit(round_no)
        )
        if bump_attempts:
            out = out.withColumn("attempts", F.col("attempts") + 1)
        return out.select([f.name for f in FRONTIER_SCHEMA.fields])

    # ONE pass over `fetched` settles all four fetch outcomes — status and
    # attempts are CASE expressions instead of four filter+union branches.
    # The union tree this removes was pure driver cost: every extra branch
    # is another Catalyst subtree to analyze and another AQE leaf stage to
    # schedule per round, and the round loop is the crawl's serial
    # fraction (VERDICT r3 #1a).
    oc = F.col("fetch_outcome")
    fetched_settled = (
        fetched.withColumn(
            "attempts",
            F.when(oc == "timeout", F.col("attempts") + 1).otherwise(
                F.col("attempts")
            ),
        )
        .withColumn(
            "status",
            F.when(oc == "ok_html", F.lit("fetched"))
            .when(oc == "ok_other", F.lit("skipped_non_html"))
            .when(oc == "timeout", F.lit("timeout"))
            .otherwise(F.lit("failed")),
        )
        .withColumn("round_processed", F.lit(round_no))
        .select([f.name for f in FRONTIER_SCHEMA.fields])
    )

    frontier_after = (
        settled.select([f.name for f in FRONTIER_SCHEMA.fields])
        .unionByName(deferred.select([f.name for f in FRONTIER_SCHEMA.fields]))
        .unionByName(finish(skipped_seen, "skipped_seen"))
        .unionByName(finish(blocked, "skipped_robots"))
        .unionByName(fetched_settled)
        .unionByName(new_frontier)
    )

    # -- metrics: per-partition lineage counts -------------------------------
    # ONE shuffle for all event streams: tag each cached branch and
    # aggregate the union in a single groupBy (separate groupBys =
    # separate exchanges = extra AQE sub-jobs per round of pure overhead)
    def tagged(df: DataFrame, node: str, event: str) -> DataFrame:
        return df.select(
            F.lit(node).alias("node_type"),
            F.lit(event).alias("event"),
            "task_id",
            "url",
            F.spark_partition_id().alias("partition_id"),
        )

    # urls_deferred / url_timeout_retryable let the driver detect
    # termination from the (tiny, collected) metrics alone — no extra
    # pending-scan job per round.  The three fetched-derived event streams
    # (crawled, indexed, retryable-timeout) ride ONE scan of `fetched` as
    # an exploded per-row event array instead of three filter branches —
    # same rows, a third of the leaf stages.  url_indexed carries the
    # doc_id (reference indexer logs the FINAL url, indexer_node.py:150).
    _ev = lambda node, event, url: F.struct(  # noqa: E731
        F.lit(node).alias("node_type"),
        F.lit(event).alias("event"),
        url.alias("url"),
    )
    fetched_events = fetched.select(
        "task_id",
        F.spark_partition_id().alias("partition_id"),
        F.explode(
            F.when(
                oc == "ok_html",
                F.array(
                    _ev("crawler", "url_crawled", F.col("url")),
                    _ev(
                        "indexer",
                        "url_indexed",
                        F.coalesce(F.col("final_url"), F.col("url")),
                    ),
                ),
            )
            .when(
                oc == "timeout",
                F.when(
                    F.col("attempts") + 1 < cfg.max_attempts,
                    F.array(_ev("crawler", "url_timeout_retryable", F.col("url"))),
                ).otherwise(
                    F.array().cast(
                        "array<struct<node_type:string,event:string,url:string>>"
                    )
                ),
            )
            .otherwise(
                F.array().cast(
                    "array<struct<node_type:string,event:string,url:string>>"
                )
            )
        ).alias("e"),
    ).select("e.node_type", "e.event", "task_id", "e.url", "partition_id")

    metrics = (
        tagged(new_batch, "master", "urls_scheduled")
        .unionByName(tagged(blocked, "crawler", "url_skipped"))
        .unionByName(tagged(new_frontier, "crawler", "new_urls_found"))
        .unionByName(tagged(deferred, "master", "urls_deferred"))
        .unionByName(fetched_events)
        .groupBy("node_type", "event", "task_id", "partition_id")
        .agg(F.count("*").alias("count"), F.min("url").alias("url"))
        .select(
            "node_type", "event", "task_id", "url", "count", "partition_id",
            F.lit(round_no).alias("round"),
        )
    )

    # Bloom maintenance keys come from seen_delta (exactly the keys by
    # which `seen` grows — the shard map tracks `seen` bit-for-bit)
    _phase("plan_build_postfetch", _t)
    return {
        "frontier": frontier_after,
        "seen": seen_final,
        "seen_delta": seen_delta,
        "robots": robots_after,
        "robots_delta": fetched_rules,
        "documents": documents,
        "metrics": metrics,
        "_persisted": [windowed, new_batch, candidates, fresh],
    }


def _update_bloom(
    bloom: dict[int, bytes],
    delta_df: DataFrame,
    n_delta: int,
    cfg: CrawlConfig,
    seen_full: DataFrame | None = None,
) -> dict[int, bytes]:
    """Insert a round's seen-delta keys into the shard map.

    Small deltas (≤ ``cfg.bloom_delta_collect_max`` keys) collect to the
    driver for one vectorized numpy pass.  Larger deltas run the
    distributed ``build_bloom_shards`` over the delta and bitwise-OR the
    resulting shard blobs into the map (``or_shards``) — a breadth-y round
    at 10^10-URL scale adds billions of keys, which must never transit the
    driver.  Both paths are bit-identical (asserted by
    tests/test_seen.py::test_bloom_delta_paths_identical).

    Cuckoo shards can't be bitwise-ORed, so big cuckoo deltas instead
    rebuild the shard map distributedly from ``seen_full`` (the complete
    post-round seen set) — bounded driver contact either way.
    """
    import numpy as _np

    if cfg.filter_kind == "cuckoo":
        from ..operators import cuckoo as ckf

        if n_delta > cfg.bloom_delta_collect_max:
            # never collect an oversized delta driver-side: rebuild the
            # cuckoo shards executor-side from the full seen set and
            # collect only the MB-sized blobs
            assert seen_full is not None, "big cuckoo delta needs seen_full"
            shards_df = ckf.build_cuckoo_shards(
                seen_full, cfg.bloom_shards,
                max(cfg.bloom_bits_per_shard // 64, 1024),
            )
            return seen_ops.shards_to_dict(shards_df)
        keys = _np.array(
            [r[0] for r in delta_df.select("url_hash").collect()], dtype=_np.int64
        )
        by_shard = {
            int(s): keys[_np.mod(keys, cfg.bloom_shards) == s]
            for s in _np.unique(_np.mod(keys, cfg.bloom_shards))
        }
        return ckf.merge_shards(
            bloom, by_shard, max(cfg.bloom_bits_per_shard // 64, 1024)
        )
    if n_delta <= cfg.bloom_delta_collect_max:
        keys = _np.array(
            [r[0] for r in delta_df.select("url_hash").collect()], dtype=_np.int64
        )
        return seen_ops.bloom_insert_driver(
            bloom, keys, cfg.bloom_shards, cfg.bloom_bits_per_shard
        )
    shards_df = seen_ops.build_bloom_shards(
        delta_df, cfg.bloom_shards, cfg.bloom_bits_per_shard
    )
    return seen_ops.or_shards(bloom, seen_ops.shards_to_dict(shards_df))


def run_crawl(
    spark: SparkSession,
    seed_jobs: DataFrame,
    web_pages: DataFrame,
    robots_src: DataFrame,
    cfg: CrawlConfig,
    store: SnapshotStore | None = None,
    resume: bool = False,
) -> dict[str, DataFrame]:
    """Driver round loop with snapshot commit + resume.

    Gives the termination detection the reference lacks (SURVEY.md §3.1):
    stop when no retryable rows remain or max_rounds hit.  With ``store``
    each round commits atomically; ``resume=True`` continues from the last
    committed round (bit-identical to an uninterrupted run — verified by
    tests/test_resume.py).
    """
    # crawl-scoped session conf (cfg.extra["conf"]): applied for the round
    # loop and RESTORED afterwards, so callers can tune runtime knobs (AQE,
    # partition advisories) for the crawl without leaking them into the
    # rest of the session's queries
    _conf_overrides = cfg.extra.get("conf") or {}
    _conf_saved: dict[str, str | None] = {}
    for _k, _v in _conf_overrides.items():
        try:
            _conf_saved[_k] = spark.conf.get(_k)
        except Exception:
            _conf_saved[_k] = None
        spark.conf.set(_k, _v)

    try:
        return _run_crawl_inner(
            spark, seed_jobs, web_pages, robots_src, cfg, store, resume
        )
    finally:
        for _k, _old in _conf_saved.items():
            if _old is None:
                spark.conf.unset(_k)
            else:
                spark.conf.set(_k, _old)


def _run_crawl_inner(
    spark: SparkSession,
    seed_jobs: DataFrame,
    web_pages: DataFrame,
    robots_src: DataFrame,
    cfg: CrawlConfig,
    store: SnapshotStore | None = None,
    resume: bool = False,
) -> dict[str, DataFrame]:
    if resume:
        assert store is not None and store.current_round() >= 0
        start_round = store.current_round() + 1
        frontier = store.read("frontier")
        seen = store.read("seen")
        robots_rules = store.read("robots")
    else:
        start_round = 0
        valid_jobs, _rejected = validate_seed_jobs(seed_jobs)
        jobs = dedupe_seed_jobs(valid_jobs)
        # materialize once: the seed subtree (explode + canonicalize UDFs)
        # is referenced by many round-0 branches and would otherwise
        # re-execute per consumer
        frontier = seeds_to_frontier(spark, jobs).localCheckpoint()
        seen = _empty(spark, SEEN_SCHEMA)
        robots_rules = _empty(spark, "host string, rules_txt string")

    documents = _empty(spark, DOCUMENTS_SCHEMA)
    metrics = _empty(spark, METRICS_SCHEMA)
    # metrics rows are tiny per-task aggregates — in the no-store path
    # they are collected driver-side (one small job per round) instead of
    # checkpointed, and the driver derives the TERMINATION signal from
    # them (deferred + retryable timeouts + new URLs == 0 ⇒ frontier
    # drained) without an extra pending-scan job
    metric_rows: list = []
    driver_mode = store is None and not resume
    robots_driver: list | None = [] if driver_mode else None
    bloom: dict[int, bytes] | None = None
    retryable = (F.col("status") == "pending") | (
        (F.col("status") == "timeout") & (F.col("attempts") < cfg.max_attempts)
    )
    _RETRYABLE_EVENTS = {"urls_deferred", "url_timeout_retryable", "new_urls_found"}
    pending_known_empty = False
    pending_hint: int | None = None  # unknown until a round's metrics land

    # state tables are re-materialized every round; without an explicit
    # repartition the 9-branch frontier union COMPOUNDS partitions across
    # rounds (round 4 reached ~1600 near-empty partitions — pure task
    # overhead that grows with core count).  Normalizing to a fixed
    # url_hash bucketing also gives next round's anti-joins a stable
    # co-partitioning.  (At 10^10 scale the same normalization is the
    # Iceberg state-table write: bucket(url_hash) partitioning.)
    n_buckets = int(
        cfg.extra.get("n_buckets", spark.sparkContext.defaultParallelism)
    )

    # per-run scratch dir for columnar round-state materializations — a
    # subdir of Spark's OWN managed local dir (local SSD / tmpfs), so the
    # JVM shutdown hook deletes it with the rest of the app's scratch;
    # keyed by app id so concurrent sessions never collide
    try:
        _managed = (
            spark.sparkContext._jvm.org.apache.spark.util.Utils.getLocalDir(
                spark.sparkContext._jsc.sc().conf()
            )
        )
    except Exception:  # py4j surface moved — fall back to the raw conf dir
        _managed = spark.sparkContext.getConf().get(
            "spark.local.dir", "/tmp"
        ).split(",")[0]
    # per-INVOCATION suffix: two run_crawl calls in one session must not
    # collide — the second would overwrite fetched_r* parquet the first
    # run's returned (lazy) DataFrames still reference
    scratch = cfg.extra.get(
        "scratch",
        f"{_managed}/crawl-{spark.sparkContext.applicationId}-{next(_RUN_SEQ)}",
    )

    # Optional: pre-hash-partition web_pages on the join key so each
    # round's sort-merge fetch join reuses the partitioning instead of
    # re-exchanging the heaviest table.  Off by default: the one-time
    # shuffle + second cached copy only amortizes on LONG crawls (many
    # rounds); interleaved A/B at 3 rounds showed no win.  At production
    # scale the equivalent is a bucketed/Iceberg fetch-cache table, which
    # pays the layout cost once at ingest, not per crawl.
    if cfg.extra.get("web_prepart", False):
        web_pages = web_pages.repartition(n_buckets, "url").persist()

    for round_no in range(start_round, cfg.max_rounds):
        if pending_known_empty:
            break
        if not driver_mode and (
            frontier.filter(retryable).limit(1).count() == 0
        ):
            break
        if driver_mode and round_no == start_round:
            # one initial job only; thereafter the metric counts decide.
            # A FULL count (the frontier is a localCheckpoint — counting
            # it is metadata-cheap) instead of the old limit(1) emptiness
            # probe: the exact figure seeds pending_hint, so an
            # under-budget round 0 skips its provably-identity politeness
            # windows exactly like the metric-hinted later rounds do.
            n_start = frontier.filter(retryable).count()
            if n_start == 0:
                break
            if cfg.extra.get("round0_hint", True):
                pending_hint = n_start
        if cfg.use_bloom and bloom is None:
            # full build only on entry (empty at fresh start; one pass on
            # resume) — thereafter updated incrementally from round deltas
            if cfg.filter_kind == "cuckoo":
                from ..operators import cuckoo as ckf

                shards_df = ckf.build_cuckoo_shards(
                    seen, cfg.bloom_shards, max(cfg.bloom_bits_per_shard // 64, 1024)
                )
            else:
                shards_df = seen_ops.build_bloom_shards(
                    seen, cfg.bloom_shards, cfg.bloom_bits_per_shard
                )
            bloom = seen_ops.shards_to_dict(shards_df)
        out = run_round(
            spark, round_no, frontier, seen, robots_rules,
            web_pages, robots_src, cfg, bloom,
            scratch=scratch if cfg.extra.get("fetched_parquet", True) else None,
            pending_hint=pending_hint,
        )
        pending_hint = None  # recomputed from this round's metrics below
        out["documents"] = out["documents"].coalesce(n_buckets)
        if store is not None:
            # durable commits write the full seen state (an Iceberg state
            # table); the bucketing keeps files/partitions bounded
            out["frontier"] = out["frontier"].repartition(n_buckets, "url_hash")
            out["robots"] = out["robots"].coalesce(1)  # ≤ one row per host
            out["metrics"] = out["metrics"].coalesce(n_buckets)
            out["seen"] = out["seen"].repartition(n_buckets, "url_hash")
            store.commit_round(
                round_no,
                {
                    "frontier": (out["frontier"], "state"),
                    "seen": (out["seen"], "state"),
                    "robots": (out["robots"], "state"),
                    "documents": (out["documents"], "append"),
                    "metrics": (out["metrics"], "append"),
                },
                extras={"config": {"budget": cfg.politeness_budget,
                                   "max_depth": cfg.max_depth,
                                   "salt_buckets": cfg.salt_buckets}},
            )
            frontier = store.read("frontier")
            seen = store.read("seen")
            robots_rules = store.read("robots")
        else:
            # no store: materialize via localCheckpoint to cut lineage
            # growth.  DISK_ONLY keeps round history (esp. documents with
            # full html) OFF the driver heap — deserialized in-memory
            # checkpoints accumulate across rounds and trigger GC storms;
            # "disk" is spark.local.dir (tmpfs-if-roomy here, local SSD on
            # a real cluster), so reads stay fast.
            #
            # The driver round loop is the crawl's serial (Amdahl) fraction
            # — every Spark ACTION costs planning + per-stage scheduling
            # latency that no executor count amortizes.  So the round's
            # four state products (frontier, seen delta, metrics, robots
            # delta) materialize in ONE union-tagged checkpoint (schemas
            # padded with nulls via allowMissingColumns) and split back out
            # as narrow filters OVER the checkpoint; the tiny metrics +
            # robots rows then come back in ONE collect.  2 jobs/round
            # instead of 5.
            from pyspark.storagelevel import StorageLevel

            import time as _time

            _phase_log = cfg.extra.get("phase_log")
            _pt = _time.perf_counter()

            def _phase(name: str, t0: float) -> float:
                now = _time.perf_counter()
                if _phase_log is not None:
                    _phase_log.append((round_no, name, now - t0))
                return now

            _ck = {"eager": True, "storageLevel": StorageLevel.DISK_ONLY}
            tagged = (
                out["frontier"]
                .withColumn("_tbl", F.lit("frontier"))
                .unionByName(
                    out["seen_delta"].withColumn("_tbl", F.lit("seen")),
                    allowMissingColumns=True,
                )
                .unionByName(
                    out["metrics"].withColumn("_tbl", F.lit("metrics")),
                    allowMissingColumns=True,
                )
                .unionByName(
                    out["robots_delta"].withColumn("_tbl", F.lit("robots")),
                    allowMissingColumns=True,
                )
            )
            _pt = _phase("state_plan_build", _pt)
            state_ck = tagged.repartition(n_buckets, "url_hash").localCheckpoint(
                **_ck
            )
            _pt = _phase("state_checkpoint", _pt)
            frontier = state_ck.filter(F.col("_tbl") == "frontier").select(
                [f.name for f in FRONTIER_SCHEMA.fields]
            )
            seen_delta_ck = state_ck.filter(F.col("_tbl") == "seen").select(
                "url_hash", "url"
            )
            # ONE Arrow-backed collect returns the tiny metrics + robots
            # rows plus (bounded) this round's seen-delta keys for the
            # Bloom update.  Two corruption/safety rules, both learned the
            # hard way (ADVICE r2):
            # - the keys ride as STRINGS: the union-tagged frame has null
            #   url_hash on metrics/robots rows, and Arrow's null-int64 →
            #   float64 pandas conversion silently rounds away the low
            #   bits of xxhash64 keys (53-bit mantissa) — the Bloom map
            #   would then track the WRONG keys and re-linked URLs would
            #   be re-crawled.  Decimal strings round-trip exactly.
            # - the slice is LIMIT-bounded to bloom_delta_collect_max+1:
            #   a breadth-explosion round can never pull an oversized
            #   delta through the driver; hitting the bound falls back to
            #   the distributed shard build below.
            base = state_ck.filter(
                F.col("_tbl").isin(["metrics", "robots"])
            ).select(
                "_tbl", "node_type", "event", "task_id", "url", "count",
                "partition_id", "round", "host", "rules_txt",
                F.lit(None).cast("string").alias("url_hash_str"),
            )
            collect_keys = (
                cfg.use_bloom
                and bloom is not None
                and cfg.filter_kind != "cuckoo"
            )
            if collect_keys:
                keys_slice = (
                    state_ck.filter(F.col("_tbl") == "seen")
                    .select(
                        F.col("url_hash").cast("string").alias("url_hash_str")
                    )
                    .limit(cfg.bloom_delta_collect_max + 1)
                    .withColumn("_tbl", F.lit("seen"))
                )
                base = base.unionByName(keys_slice, allowMissingColumns=True)
            _pt = _phase("collect_plan_build", _pt)
            small_pdf = base.toPandas()
            _pt = _phase("collect_small", _pt)
            m = small_pdf[small_pdf["_tbl"] == "metrics"]
            round_rows = [
                (nt, ev, tid, url, int(cnt), int(pid), int(rnd))
                for nt, ev, tid, url, cnt, pid, rnd in zip(
                    m["node_type"], m["event"], m["task_id"], m["url"],
                    m["count"], m["partition_id"], m["round"],
                )
            ]
            rb = small_pdf[small_pdf["_tbl"] == "robots"]
            robots_delta_rows = list(
                zip(rb["host"].tolist(), rb["rules_txt"].tolist())
            )
            # seen grows append-only: the round DELTA is a narrow slice of
            # the state checkpoint and the full set stays a lazy union of
            # those slices — never rewrites crawl history.  Compact
            # periodically so partition count stays bounded on long crawls.
            seen = seen.unionByName(seen_delta_ck)
            if (round_no + 1) % 8 == 0:
                seen = seen.repartition(n_buckets, "url_hash").localCheckpoint(**_ck)
            # documents is a narrow select over the round's fetched
            # checkpoint (run_round materializes fetch+parse eagerly) —
            # no second serialization pass needed
            documents = documents.unionByName(out["documents"])
            # robots rules: one small row per distinct host ever seen —
            # driver-side while the host count is bounded (gate joins a
            # local relation, no checkpoint job); beyond
            # cfg.robots_driver_max hosts the rules stay a DataFrame of
            # checkpointed deltas (10^7 hosts × KB rules never transit the
            # driver)
            if robots_driver is not None:
                robots_driver.extend(
                    robots_delta_rows
                )
                robots_rules = (
                    spark.createDataFrame(
                        robots_driver, "host string, rules_txt string"
                    )
                    if robots_driver
                    else _empty(spark, "host string, rules_txt string")
                )
                if len(robots_driver) > cfg.robots_driver_max:
                    # seed the DataFrame path with the accumulated rules,
                    # then stop routing rules through the driver
                    robots_rules = robots_rules.localCheckpoint(**_ck)
                    robots_driver = None
            else:
                robots_rules = robots_rules.unionByName(
                    state_ck.filter(F.col("_tbl") == "robots").select(
                        "host", "rules_txt"
                    )
                )
                if (round_no + 1) % 8 == 0:
                    robots_rules = robots_rules.coalesce(1).localCheckpoint(**_ck)
            metric_rows.extend(round_rows)
            pending_known_empty = not any(
                event in _RETRYABLE_EVENTS and count > 0
                for (_, event, _, _, count, _, _) in round_rows
            )
            # exact retryable count entering the NEXT round: deferred +
            # retryable timeouts + newly enqueued URLs (every other row is
            # settled).  Lets run_round skip provably-identity windowing.
            pending_hint = sum(
                count
                for (_, event, _, _, count, _, _) in round_rows
                if event in _RETRYABLE_EVENTS
            )
            if cfg.use_bloom and bloom is not None:
                if collect_keys:
                    key_strs = small_pdf.loc[
                        small_pdf["_tbl"] == "seen", "url_hash_str"
                    ]
                    if len(key_strs) <= cfg.bloom_delta_collect_max:
                        # full delta came back (under the bound): exact
                        # int64 keys via C-speed decimal-string parse
                        import numpy as _np

                        seen_key_rows = key_strs.to_numpy().astype(_np.int64)
                        bloom = seen_ops.bloom_insert_driver(
                            bloom, seen_key_rows,
                            cfg.bloom_shards, cfg.bloom_bits_per_shard,
                        )
                    else:
                        # bound hit ⇒ delta too big to transit the driver:
                        # distributed shard build + OR-merge
                        bloom = _update_bloom(
                            bloom, seen_delta_ck,
                            cfg.bloom_delta_collect_max + 1, cfg,
                            seen_full=seen,
                        )
                else:
                    n_delta = sum(
                        count
                        for (_, event, _, _, count, _, _) in round_rows
                        if event in ("new_urls_found", "urls_scheduled")
                    )
                    bloom = _update_bloom(
                        bloom, seen_delta_ck, n_delta, cfg, seen_full=seen
                    )
            _phase("driver_bookkeeping", _pt)
        if store is not None and cfg.use_bloom and bloom is not None:
            # store path: delta size unknown until counted — count() on the
            # committed delta is a metadata-cheap job
            delta_df = out["seen_delta"]
            n_delta = delta_df.count()
            bloom = _update_bloom(bloom, delta_df, n_delta, cfg, seen_full=seen)
        for df in out.get("_persisted", []):
            df.unpersist()

    # last-write-wins document surface (reference ES upsert keyed by URL,
    # indexer_node.py:145-156): the round log is append-only; the returned
    # `documents` collapses re-crawled URLs to their newest version.  With
    # the in-run seen-set this is the identity — it matters on resume-
    # after-reset / forced-refresh crawls where a URL re-enters the
    # frontier.  One key-partitioned window, no global ordering.
    from ..operators.dedup import keep_latest

    if store is not None:
        return {
            "frontier": store.read("frontier"),
            "seen": store.read("seen"),
            "documents": keep_latest(
                store.read("documents"), ["canonical_url"], "round",
                tiebreak_col="doc_id",
            ),
            "metrics": store.read("metrics"),
            "robots": store.read("robots"),
        }
    if metric_rows:
        metrics = spark.createDataFrame(metric_rows, METRICS_SCHEMA)
    return {
        "frontier": frontier,
        "seen": seen,
        "documents": keep_latest(
            documents, ["canonical_url"], "round", tiebreak_col="doc_id"
        ),
        "metrics": metrics,
        "robots": robots_rules,
    }


__all__ = [
    "CrawlConfig",
    "FRONTIER_SCHEMA",
    "seeds_to_frontier",
    "dedupe_seed_jobs",
    "validate_seed_jobs",
    "run_round",
    "run_crawl",
]
