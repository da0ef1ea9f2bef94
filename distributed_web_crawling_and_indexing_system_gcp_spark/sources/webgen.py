"""Deterministic synthetic closed-world web graph.

Generates the ``web_pages`` fetch-oracle table (FIXTURES.md §3) as a
*distributed* DataFrame transform — ``spark.range(n)`` + one Arrow-batched
pandas UDF composing HTML from the page index — so the same generator
serves unit tests (hundreds of pages) and the benchmark (hundreds of
thousands) without a driver-side loop.

Every property is a pure function of the page index ``i`` (no RNG state),
so any two runs — and the pytest oracle reading the collected rows — see
the identical web.  The graph exercises the reference's corner cases:

- one deliberately hot host (index-skew for the politeness/salting path)
- relative / absolute / fragment / trailing-slash / uppercase /
  newline-polluted hrefs; mailto+javascript schemes (filtered)
- off-world links (fetch error), timeouts, HTTP 500s, redirects,
  non-HTML content types, /private/ paths for robots rules
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_HOST_SHARE = 3  # host 0 receives i%SHARE==0 pages → ~1/3 of the web


def host_of(i: int, n_hosts: int) -> int:
    # multiplier must be coprime with (n_hosts-1) so non-hot pages spread
    return 0 if i % HOT_HOST_SHARE == 0 else 1 + (i * 5 + 3) % (n_hosts - 1)


def _zipf_cum(n_hosts: int, s: float) -> list[float]:
    w = [1.0 / (h + 1) ** s for h in range(n_hosts)]
    tot = sum(w)
    cum, acc = [], 0.0
    for x in w:
        acc += x / tot
        cum.append(acc)
    return cum


_ZIPF_CACHE: dict[tuple[int, float], list[float]] = {}


def zipf_host_of(i: int, n_hosts: int, s: float = 1.2) -> int:
    """Zipf-distributed host id: host rank h gets share ∝ 1/(h+1)^s —
    the real-web long tail (host 0 ≈ 35-45% of pages at s=1.2, 8 hosts).
    Deterministic pure function of ``i`` (Knuth multiplicative hash →
    inverse-CDF), so the skewed web is as replayable as the uniform one."""
    cum = _ZIPF_CACHE.get((n_hosts, s))
    if cum is None:
        cum = _ZIPF_CACHE[(n_hosts, s)] = _zipf_cum(n_hosts, s)
    u = ((i * 2654435761) & 0xFFFFFFFF) / 2.0**32
    import bisect

    return bisect.bisect_right(cum, u)


def url_of(i: int, n_hosts: int, host_fn=host_of) -> str:
    h = host_fn(i, n_hosts)
    if i % 13 == 5:
        return f"http://h{h}.test/private/{i}"
    return f"http://h{h}.test/p/{i}"


def _links_for(i: int, n: int, n_hosts: int, host_fn=host_of) -> list[str]:
    """Raw hrefs embedded in page i, document order."""
    # j3 = i+21 stays on the SAME host away from wrap (21 ≡ 0 mod 7 and
    # mod 3), so the host-relative link below is usually alive
    j1, j2, j3 = (i * 2 + 1) % n, (i * 3 + 5) % n, (i + 21) % n
    j4, j5 = (i * 5 + 2) % n, (i * 7 + 11) % n
    u2 = url_of(j2, n_hosts, host_fn)
    links = [
        url_of(j1, n_hosts, host_fn),              # absolute
        "/" + "/".join(url_of(j3, n_hosts, host_fn).split("/")[3:]),  # host-relative
        u2.upper().replace("HTTP://", "http://"),  # uppercase host+path dup
        url_of(j4, n_hosts, host_fn),              # absolute
        url_of(j5, n_hosts, host_fn),              # absolute
    ]
    if i % 4 == 0:
        links.append(url_of(j1, n_hosts, host_fn) + "/")    # trailing-slash dup
    if i % 5 == 0:
        links.append(url_of(j2, n_hosts, host_fn) + "#sec") # fragment dup
    if i % 6 == 0:
        links.append("\n" + url_of(j3, n_hosts, host_fn) + "  ")  # polluted href
    if i % 7 == 0:
        links.append("mailto:admin@h0.test")       # filtered scheme
        links.append("javascript:void(0)")         # filtered scheme
    if i % 9 == 0:
        links.append(f"http://h{host_fn(i, n_hosts)}.test/missing/{i}")  # off-world
    if i % 11 == 0:
        links.append("#top")                       # self fragment
    return links


_WORDS = (
    "frontier fetch crawl index spark shuffle partition bloom filter host "
    "politeness robots depth queue batch span text media link anchor"
).split()


def _html_for(i: int, n: int, n_hosts: int, richness: int = 1, host_fn=host_of) -> str:
    """``richness`` scales page weight (paragraphs + extra cross links)
    without changing the base link structure the parity tests pin down —
    richness=1 is the test fixture; the bench uses heavier pages so parse
    work dominates per-round orchestration."""
    words = " ".join(_WORDS[(i + k) % len(_WORDS)] for k in range(10))
    parts = [
        f"<html><head><title>Page {i}</title></head><body>",
        f"<h1>Page {i} on h{host_fn(i, n_hosts)}</h1>",
        f"<p>{words}</p>",
    ]
    for pos, href in enumerate(_links_for(i, n, n_hosts, host_fn)):
        parts.append(f'<a href="{href}">link {pos}</a>')
        if pos % 2 == 0:
            parts.append(f"<span>between {i} {pos}</span>")
        if pos % 3 == 0:
            parts.append(f'<img src="/img/{i}_{pos}.png">')
    for r in range(richness - 1):
        para = " ".join(
            _WORDS[(i * 7 + r * 13 + k) % len(_WORDS)] for k in range(40)
        )
        parts.append(f"<p>{para}</p>")
        parts.append(f'<a href="{url_of((i * 11 + r * 29 + 1) % n, n_hosts, host_fn)}">x{r}</a>')
        parts.append(f'<img src="/img/{i}_{r}_extra.png">')
    parts.append("</body></html>")
    return "\n".join(parts)


def make_web_pages(
    spark: SparkSession, n_pages: int, n_hosts: int = 8, richness: int = 1,
    zipf_s: float | None = None,
) -> DataFrame:
    """(url, final_url, status, content_type, html, fetch_ms) — the
    closed-world fetch oracle, generated executor-side.

    ``zipf_s``: when set, hosts follow a Zipf(s) long-tail distribution
    (``zipf_host_of``) instead of the default hot-host split — the skewed-
    host fixture for proving the salted politeness window holds at
    real-web skew (VERDICT r3 #7)."""
    if zipf_s is not None:
        _s = float(zipf_s)

        def host_fn(i: int, nh: int) -> int:
            return zipf_host_of(i, nh, _s)
    else:
        host_fn = host_of

    def gen(idx: pd.Series) -> pd.DataFrame:
        rows = []
        for i in idx:
            i = int(i)
            u = url_of(i, n_hosts, host_fn)
            status, ctype, html = 200, "text/html; charset=utf-8", None
            final = u
            if i % 97 == 3:
                status = 500
            elif i % 89 == 7:
                status = -1  # timeout
            elif i % 83 == 11:
                ctype = "application/pdf"
            else:
                if i % 61 == 13:
                    final = u + "?canonical=1"  # redirect
                html = _html_for(i, n_pages, n_hosts, richness, host_fn)
            rows.append(
                {
                    "url": u,
                    "final_url": final,
                    "status": status,
                    "content_type": ctype,
                    "html": html,
                    "fetch_ms": 10 + (i * 37) % 200,
                }
            )
        return pd.DataFrame(rows)

    from pyspark.sql.functions import pandas_udf

    schema = (
        "url string, final_url string, status int, content_type string, "
        "html string, fetch_ms int"
    )

    @pandas_udf(schema)
    def gen_udf(idx: pd.Series) -> pd.DataFrame:
        return gen(idx)

    return (
        spark.range(n_pages)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .select(gen_udf(F.col("id")).alias("p"))
        .select("p.*")
    )


def make_robots_src(spark: SparkSession, n_hosts: int = 8) -> DataFrame:
    """Per-host robots fixture: h1 disallows /private/, h2 disallows all,
    h3 absent (fetch-failed ⇒ permissive), others allow all."""
    rows = []
    for h in range(n_hosts):
        host = f"h{h}.test"
        if h == 1:
            rows.append((host, "User-agent: *\nDisallow: /private/"))
        elif h == 2:
            rows.append((host, "User-agent: *\nDisallow: /"))
        elif h == 3:
            continue  # missing ⇒ permissive
        else:
            rows.append((host, "User-agent: *\nAllow: /"))
    return spark.createDataFrame(rows, "host string, rules_txt string")


def make_seed_jobs(spark: SparkSession, n_hosts: int = 8, depth: int = 3) -> DataFrame:
    """Three seed jobs: a plain one, a domain-restricted one, and a
    duplicate of the first (exercises UI-level seed-set dedup)."""
    jobs = [
        # h2 is fully robots-blocked → exercises skipped_robots on a seed
        ("task-a", ["http://h0.test/p/0", "http://h2.test/p/1"], depth, None),
        # domain-restricted job (SUBSTRING semantics) seeded on h1
        ("task-b", ["http://h1.test/p/19"], depth, "h1.test"),
        # duplicate seed set → UI-level job dedup (J5)
        ("task-z", ["http://h0.test/p/0", "http://h2.test/p/1"], depth, None),
        # overlapping single seed under a different job → selection dedup
        ("task-c", ["http://h0.test/p/0"], depth, None),
    ]
    return spark.createDataFrame(
        jobs,
        "task_id string, seed_urls array<string>, depth int, domain_restriction string",
    )


__all__ = [
    "make_web_pages", "make_robots_src", "make_seed_jobs",
    "url_of", "host_of", "zipf_host_of",
]
