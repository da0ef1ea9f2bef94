"""Property-based tests (hypothesis) — SURVEY.md §5.4.

Properties run against the pure-Python primitives shared with the engine
(canonicalization idempotence, dedup-key uniqueness, politeness bound);
Spark-side equivalents are covered by the example-based tests (spawning a
Spark job per hypothesis example would be pathological).
"""

from __future__ import annotations

from urllib.parse import urlparse

from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_crawling_and_indexing_system_gcp_spark.functions.urls import (
    _canonicalize_one,
)

# URL-ish strings: scheme://host(/path)(?query)(#frag) with messy case and
# whitespace pollution
_host = st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,10}){0,4}/?", fullmatch=True)
_query = st.one_of(st.just(""), st.from_regex(r"\?[A-Za-z0-9=&]{1,15}", fullmatch=True))
_frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,8}", fullmatch=True))
_pad = st.sampled_from(["", " ", "\n", "\r", "  "])


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Http"]))
    return (
        draw(_pad)
        + f"{scheme}://{draw(_host)}{draw(_path)}{draw(_query)}{draw(_frag)}"
        + draw(_pad)
    )


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = _canonicalize_one(u)
    assert _canonicalize_one(c) == c


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonical_has_no_fragment_or_trailing_slash(u):
    c = _canonicalize_one(u)
    assert not c.endswith("/")
    assert "#" not in c
    assert c == c.lower()


@given(urls())
@settings(max_examples=200, deadline=None)
def test_canonical_matches_reference_formula(u):
    """Bit-for-bit the reference normalize_url (crawler_node.py:98-107)."""
    cleaned = u.strip().replace("\r", "").replace("\n", "")
    p = urlparse(cleaned)
    want = f"{p.scheme}://{p.netloc}{p.path}"
    if p.query:
        want += f"?{p.query}"
    assert _canonicalize_one(u) == want.lower().rstrip("/")


@given(
    st.lists(
        st.tuples(st.sampled_from([f"h{i}" for i in range(5)]), st.integers(0, 999)),
        min_size=1,
        max_size=200,
    ),
    st.integers(1, 10),
)
@settings(max_examples=100, deadline=None)
def test_politeness_selection_invariants(rows, budget):
    """Model of the two-phase window: per-host ≤ budget, selection is the
    per-host prefix of the (depth, url) order."""
    frontier = [
        {"host": h, "url": f"http://{h}/p/{i}", "depth": i % 4}
        for h, i in rows
    ]
    frontier.sort(key=lambda r: (r["depth"], r["url"]))
    taken: dict[str, int] = {}
    selected = []
    for r in frontier:
        if taken.get(r["host"], 0) < budget:
            taken[r["host"]] = taken.get(r["host"], 0) + 1
            selected.append(r)
    from collections import Counter

    per_host = Counter(r["host"] for r in selected)
    assert all(v <= budget for v in per_host.values())
    # every deferred row sorts after every selected row of its host
    sel_max = {}
    for r in selected:
        sel_max[r["host"]] = max(
            sel_max.get(r["host"], ("", "")), (str(r["depth"]), r["url"])
        )
    for r in frontier:
        if r not in selected and r["host"] in sel_max:
            assert (str(r["depth"]), r["url"]) >= sel_max[r["host"]]
