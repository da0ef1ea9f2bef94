"""Real-socket validation of the production fetch stage (VERDICT r3 #3).

A loopback ``http.server`` serves the deterministic webgen fixture (no
outbound network); the REAL grouped/paced ``fetch_over_network`` stage runs
through a REAL ``requests.Session`` (``requests_fetcher`` — the reference
crawler's request shape, crawler_node.py:270-285: UA header, timeout,
allow_redirects, status routing) and must agree with the closed-world
``fetch_synthetic`` join on the same fixture, including timeout→retry and
error→drop routing through a full ``run_crawl``, and observed ≥interval
per-(host,salt) request spacing.

Transport mapping: crawl-space hosts (``hN.test``) cannot resolve, so URLs
ride the loopback socket as a path prefix —
``http://h3.test/p/7`` → ``http://127.0.0.1:<port>/h3.test/p/7`` — via the
fetcher's proxy-style ``url_rewrite``/``url_restore`` hooks; redirects are
served as path-absolute Locations so the restored final URL is exact.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.sources import webgen
from distributed_web_crawling_and_indexing_system_gcp_spark.sources.fetch import (
    classify_fetch,
    fetch_over_network,
    fetch_synthetic,
    requests_fetcher,
)

N_PAGES = 60
N_HOSTS = 8
TIMEOUT_SLEEP_S = 1.2
CLIENT_TIMEOUT_S = 0.4


class _WebHandler(BaseHTTPRequestHandler):
    """Serves the collected webgen fixture keyed by crawl-space URL."""

    web: dict[str, dict] = {}
    times: dict[str, list[float]] = {}
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802 (http.server API)
        full = self.path.lstrip("/")
        host = full.split("/", 1)[0]
        with self.lock:
            self.times.setdefault(host, []).append(time.monotonic())
        base, _, query = full.partition("?")
        url = f"http://{base}"
        row = self.web.get(url)
        if row is None:
            self._respond(404, "text/plain", b"not found")
        elif row["status"] == -1:
            time.sleep(TIMEOUT_SLEEP_S)  # client times out first
            self._respond(200, "text/plain", b"too late")
        elif row["status"] == 500:
            self._respond(500, "text/html; charset=utf-8", b"")
        elif "pdf" in row["content_type"]:
            self._respond(200, row["content_type"], b"")
        elif row["final_url"] != url and not query:
            # redirect page: Location is path-absolute so the transport
            # host is preserved; the target (?canonical=1) serves the html
            self.send_response(302)
            self.send_header("Location", "/" + base + "?canonical=1")
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self._respond(
                200, row["content_type"], (row["html"] or "").encode("utf-8")
            )

    def _respond(self, status: int, ctype: str, body: bytes):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def web_df(spark):
    return webgen.make_web_pages(spark, N_PAGES, N_HOSTS).cache()


@pytest.fixture(scope="module")
def server(web_df):
    _WebHandler.web = {r["url"]: r.asDict() for r in web_df.collect()}
    _WebHandler.times = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _WebHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def _rewriters(port: int):
    prefix = f"http://127.0.0.1:{port}/"

    def rewrite(url: str) -> str:
        return prefix + url.removeprefix("http://")

    def restore(url: str) -> str:
        return "http://" + url.removeprefix(prefix)

    return rewrite, restore


def _batch(spark, urls):
    rows = [
        (u, webgen.host_of(i, N_HOSTS), i % 2)
        for i, u in urls
    ]
    return spark.createDataFrame(
        [(u, f"h{h}.test", s) for (u, h, s) in rows],
        "url string, host string, host_salt int",
    )


def test_socket_stage_matches_synthetic(spark, web_df, server):
    """fetch_over_network over real sockets == fetch_synthetic, column for
    column on non-timeout rows, outcome-for-outcome everywhere."""
    rewrite, restore = _rewriters(server)
    urls = [(i, webgen.url_of(i, N_HOSTS)) for i in range(24)]
    urls.append((99, "http://h0.test/missing/99"))  # off-world
    batch = _batch(spark, urls)

    fetcher = requests_fetcher(
        timeout_s=CLIENT_TIMEOUT_S, url_rewrite=rewrite, url_restore=restore
    )
    got = {
        r["url"]: r.asDict()
        for r in classify_fetch(
            fetch_over_network(batch, fetcher=fetcher, min_interval_s=0.0)
        ).collect()
    }
    want = {
        r["url"]: r.asDict()
        for r in classify_fetch(fetch_synthetic(batch, web_df)).collect()
    }
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        if w["fetch_outcome"] == "timeout":
            # a real timeout carries no response metadata; the fixture does
            assert g["fetch_outcome"] == "timeout"
            continue
        if w["http_status"] == -2:
            # off-world: connection error in the fixture, 404 on a real
            # server — both route to error→drop
            assert g["fetch_outcome"] == "error"
            continue
        assert g["fetch_outcome"] == w["fetch_outcome"], url
        assert g["http_status"] == w["http_status"], url
        assert g["final_url"] == w["final_url"], url
        assert g["content_type"] == w["content_type"], url
        assert g["html"] == w["html"], url


def test_socket_crawl_matches_synthetic(spark, web_df, server):
    """Full run_crawl through the socket fetcher == the synthetic-join
    crawl: same final frontier (incl. timeout retry attempts and
    error-drop routing) and same parsed documents."""
    from distributed_web_crawling_and_indexing_system_gcp_spark.plans.crawl import (
        CrawlConfig,
        run_crawl,
    )

    rewrite, restore = _rewriters(server)
    robots = webgen.make_robots_src(spark, N_HOSTS)
    seeds = spark.createDataFrame(
        [
            (
                "job-1",
                [
                    webgen.url_of(0, N_HOSTS),   # ok html
                    webgen.url_of(3, N_HOSTS),   # HTTP 500 → failed
                    webgen.url_of(7, N_HOSTS),   # timeout → retries
                    webgen.url_of(11, N_HOSTS),  # pdf → skipped_non_html
                    webgen.url_of(13, N_HOSTS),  # redirect
                ],
                1,
                None,
            )
        ],
        "task_id string, seed_urls array<string>, depth int, domain_restriction string",
    )

    def run(extra):
        cfg = CrawlConfig(
            max_depth=1, politeness_budget=100, salt_buckets=2,
            bloom_shards=4, bloom_bits_per_shard=1 << 14, max_rounds=6,
            extra=extra,
        )
        return run_crawl(spark, seeds, web_df, robots, cfg)

    sock = run({
        "fetcher": requests_fetcher(
            timeout_s=CLIENT_TIMEOUT_S, url_rewrite=rewrite, url_restore=restore
        ),
        "fetch_min_interval": 0.0,
    })
    synth = run({})

    cols = ["url", "canonical_url", "depth", "status", "attempts", "round_processed"]
    f_sock = sorted(tuple(r) for r in sock["frontier"].select(cols).collect())
    f_syn = sorted(tuple(r) for r in synth["frontier"].select(cols).collect())
    assert f_sock == f_syn
    # timeout retry routing really happened: attempts exhausted
    by_status = {}
    for (_, _, _, status, attempts, _) in f_sock:
        by_status.setdefault(status, []).append(attempts)
    assert set(by_status["timeout"]) == {3}

    d_cols = ["doc_id", "canonical_url", "depth", "spans"]
    d_sock = sorted(str(r) for r in sock["documents"].select(d_cols).collect())
    d_syn = sorted(str(r) for r in synth["documents"].select(d_cols).collect())
    assert d_sock == d_syn


def test_socket_pacing_observed(spark, web_df, server):
    """Within one (host, salt) group, request arrivals at the server are
    spaced ≥ min_interval_s (minus loopback jitter)."""
    rewrite, restore = _rewriters(server)
    interval = 0.3
    # 5 URLs, all on host h0 (i % 3 == 0 → hot host), one salt bucket
    urls = [(i, webgen.url_of(i, N_HOSTS)) for i in (0, 6, 12, 24, 30)]
    batch = spark.createDataFrame(
        [(u, "h0.test", 0) for (_, u) in urls],
        "url string, host string, host_salt int",
    ).coalesce(1)

    with _WebHandler.lock:
        _WebHandler.times.pop("h0.test", None)
    fetcher = requests_fetcher(
        timeout_s=2.0, url_rewrite=rewrite, url_restore=restore
    )
    fetch_over_network(batch, fetcher=fetcher, min_interval_s=interval).count()
    with _WebHandler.lock:
        stamps = sorted(_WebHandler.times.get("h0.test", []))
    assert len(stamps) == len(urls)
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    # the stage paces request RELEASES; arrivals add per-request connection
    # overhead whose variation can shrink an observed arrival gap.  The
    # FIRST request additionally pays one-off session setup (~0.1-0.2 s
    # under a loaded host), which delays arrival 1 and can compress the
    # 1→2 gap below the release interval, so spacing is asserted over the
    # steady-state arrivals (stamps[1:]); the first arrival still counts
    # toward len(stamps) above.
    assert stamps[-1] - stamps[1] >= (len(urls) - 2) * interval - 0.15, gaps
    assert min(gaps[1:]) >= interval / 2, gaps
