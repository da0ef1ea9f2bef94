"""Single-process reference-semantics oracle (SURVEY.md §5.2).

Reimplements one crawl independently of the Spark engine, using the same
stdlib primitives the reference uses (`urllib.parse.urlparse/urljoin`,
`urllib.robotparser.RobotFileParser`, an HTMLParser for bs4's
``stripped_strings``/``find_all('a')`` behavior — BeautifulSoup itself is
unavailable here).  Semantics follow /root/reference/src/crawler/
crawler_node.py and src/master/master_node.py; the deterministic ordering
contract (depth-major, (depth, url, task_id) tie-break, per-host budget
per round) is the engine's documented determinism layer over the
reference's nondeterministic Pub/Sub delivery (SURVEY.md §7 hard-part 2).

The oracle consumes the *collected* fixture rows (web_pages, robots_src,
seed jobs) as plain Python data — it never touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse
from urllib.robotparser import RobotFileParser

USER_AGENT = "MyDistributedCrawler/1.0 (+http://example.com/botinfo)"


def clean(u: str) -> str:
    return u.strip().replace("\r", "").replace("\n", "")


def normalize(u: str) -> str:
    """crawler_node.py:98-107 verbatim semantics."""
    u = clean(u)
    p = urlparse(u)
    normalized = f"{p.scheme}://{p.netloc}{p.path}"
    if p.query:
        normalized += f"?{p.query}"
    return normalized.lower().rstrip("/")


class OracleHTML(HTMLParser):
    """Independent spans/links extraction (same contract as
    functions/html.py, written separately)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, str | None, str | None]] = []

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a" and "href" in d and d["href"] is not None:
            self.out.append(("link", None, d["href"]))
        if tag == "img" and "src" in d and d["src"] is not None:
            self.out.append(("image", None, d["src"]))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        s = data.strip()
        if s:
            self.out.append(("text", s, None))


def parse_page(html: str):
    p = OracleHTML()
    p.feed(html)
    p.close()
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.out)
    ]
    links = [m for k, _, m in p.out if k == "link"]
    text = " ".join(t for k, t, _ in p.out if k == "text")
    return spans, links, text


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)
    documents: list[dict] = field(default_factory=list)
    fetch_order: list[tuple[int, int, str]] = field(default_factory=list)  # (round, depth, url)
    statuses: dict[str, str] = field(default_factory=dict)  # kept during run (one per row via canonical+task)
    frontier: list[dict] = field(default_factory=list)  # final frontier rows


def crawl_oracle(
    seed_jobs: list[dict],
    web_pages: dict[str, dict],
    robots_src: dict[str, str],
    max_depth: int = 3,
    budget: int = 8,
    max_attempts: int = 3,
    max_rounds: int = 64,
) -> OracleResult:
    res = OracleResult()

    # UI-level duplicate-job dedup (UI/main.py:185-199): same sorted seed
    # set → keep min task_id job only.
    by_sig: dict[tuple, dict] = {}
    for job in sorted(seed_jobs, key=lambda j: j["task_id"]):
        sig = tuple(sorted(job["seed_urls"]))
        by_sig.setdefault(sig, job)

    # frontier rows: dicts with url (fetch form), canonical, host, depth,
    # depth_limit, task_id, domain_restriction, status, attempts
    frontier: list[dict] = []
    for job in by_sig.values():
        for raw in job["seed_urls"]:
            u = clean(raw)
            if not u.startswith("http"):
                continue
            frontier.append(
                {
                    "url": u,
                    "canonical": normalize(u),
                    "host": urlparse(u).netloc.lower(),
                    "depth": 0,
                    "depth_limit": job["depth"],
                    "task_id": job["task_id"],
                    "domain_restriction": job.get("domain_restriction"),
                    "status": "pending",
                    "attempts": 0,
                }
            )

    seen: set[str] = set()        # enqueued-known canonicals (extraction dedup)
    processed: set[str] = set()   # canonicals selected for processing
    robots_cache: dict[str, RobotFileParser | None] = {}

    def robots_ok(host: str, url: str) -> bool:
        if host not in robots_cache:
            txt = robots_src.get(host)
            if txt is None:
                robots_cache[host] = None  # permissive
            else:
                rp = RobotFileParser()
                rp.parse(txt.splitlines())
                robots_cache[host] = rp
        rp = robots_cache[host]
        return True if rp is None else rp.can_fetch(USER_AGENT, url)

    for round_no in range(max_rounds):
        retryable = [
            r
            for r in frontier
            if r["status"] == "pending"
            or (r["status"] == "timeout" and r["attempts"] < max_attempts)
        ]
        if not retryable:
            break

        # politeness: per host, (depth, url, task_id) order, take budget
        retryable.sort(key=lambda r: (r["depth"], r["url"], r["task_id"]))
        taken: dict[str, int] = {}
        batch: list[dict] = []
        for r in retryable:
            if taken.get(r["host"], 0) < budget:
                taken[r["host"]] = taken.get(r["host"], 0) + 1
                batch.append(r)
            # else: deferred — stays as-is for next round

        # phase 1 — selection-time dedup for first-timers, in
        # (depth, url, task_id) order so within-batch duplicates resolve to
        # the min key (the engine's window dedup).  The check is against
        # *processed* canonicals (duplicate seeds / re-deliveries) — NOT the
        # enqueued-seen set, which by construction contains every child the
        # frontier itself scheduled.  Seen/processed adds happen for the
        # WHOLE batch before any extraction, and BEFORE the robots gate
        # (crawler_node.py:256-268).
        proceed: list[dict] = []
        for r in batch:
            if r["status"] == "timeout":
                proceed.append(r)  # retry: already seen, re-fetch
            elif r["canonical"] in processed:
                r["status"] = "skipped_seen"
                res.statuses[r["canonical"]] = "skipped_seen"
            else:
                processed.add(r["canonical"])
                seen.add(r["canonical"])
                proceed.append(r)

        # phase 2 — gate / fetch / parse / extract
        new_children: dict[str, dict] = {}
        for r in proceed:
            if not robots_ok(r["host"], r["url"]):
                r["status"] = "skipped_robots"
                res.statuses[r["canonical"]] = "skipped_robots"
                continue

            page = web_pages.get(r["url"])
            if page is None or page["status"] >= 400:
                r["status"] = "failed"
                res.statuses[r["canonical"]] = "failed"
                continue
            if page["status"] == -1:
                r["status"] = "timeout"
                r["attempts"] += 1
                res.statuses[r["canonical"]] = "timeout"
                continue
            if "html" not in (page["content_type"] or "").lower():
                r["status"] = "skipped_non_html"
                res.statuses[r["canonical"]] = "skipped_non_html"
                continue

            r["status"] = "fetched"
            res.statuses[r["canonical"]] = "fetched"
            res.fetch_order.append((round_no, r["depth"], r["canonical"]))
            final_url = page["final_url"] or r["url"]
            spans, links, text = parse_page(page["html"])
            res.documents.append(
                {
                    "doc_id": final_url,
                    "canonical_url": r["canonical"],
                    "task_id": r["task_id"],
                    "depth": r["depth"],
                    "round": round_no,
                    "spans": spans,
                    "text": text,
                    "html": page["html"],
                }
            )

            eff_limit = r["depth_limit"] if r["depth_limit"] is not None else max_depth
            if r["depth"] < eff_limit:
                for pos, href in enumerate(links):
                    href = clean(href)
                    new_url = urljoin(final_url, href)
                    p = urlparse(new_url)
                    if p.scheme not in ("http", "https") or not p.netloc:
                        continue
                    dr = r["domain_restriction"]
                    if dr and dr not in p.netloc:  # SUBSTRING (crawler:363)
                        continue
                    canon = normalize(clean(new_url))
                    if canon in seen:
                        continue
                    key = canon
                    cand = {
                        "url": canon,  # children enqueue normalized
                        "canonical": canon,
                        "host": urlparse(canon).netloc.lower(),
                        "depth": r["depth"] + 1,
                        "depth_limit": r["depth_limit"],
                        "task_id": r["task_id"],
                        "domain_restriction": dr,
                        "status": "pending",
                        "attempts": 0,
                        "_ord": (r["depth"] + 1, r["canonical"], pos),
                    }
                    prev = new_children.get(key)
                    if prev is None or cand["_ord"] < prev["_ord"]:
                        new_children[key] = cand

        # batch-wide child dedup resolved; now commit to seen + frontier
        for c in new_children.values():
            seen.add(c["canonical"])
            c.pop("_ord")
            frontier.append(c)

    res.seen = seen
    res.frontier = frontier
    res.statuses = {}  # rebuilt from final rows (dup canonicals possible)
    for r in frontier:
        if r["status"] != "pending":
            res.statuses.setdefault(r["canonical"], r["status"])
    return res


__all__ = ["crawl_oracle", "normalize", "clean", "parse_page", "OracleResult"]
