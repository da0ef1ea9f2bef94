"""Adversarial parity fixtures (round-2 verdict item 7).

The reference's parser behaviors (bs4 stripped_strings/find_all and
urllib.robotparser) are exactly where silent divergence hides — malformed
HTML, nested anchors, entity soup, wildcard/multi-agent robots rules.
These cases pin the engine's vectorized parsers to the independent
oracle (tests/oracle.py) and to urllib.robotparser directly.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pytest
from pyspark.sql import functions as F

from distributed_web_crawling_and_indexing_system_gcp_spark.functions.html import (
    parse_html_one,
    parse_html_udf,
)
from distributed_web_crawling_and_indexing_system_gcp_spark.operators.robots import (
    USER_AGENT,
    gate_on_robots,
)
from tests.oracle import parse_page

ADVERSARIAL_HTML = {
    "unclosed_tags": "<html><body><p>one <b>two <i>three</body></html>",
    "nested_anchors": (
        '<a href="/outer">out <a href="/inner">in</a> tail</a>'
    ),
    "entity_heavy": (
        "<p>&amp;&lt;tag&gt; &#65;&#x42; &copy;&nbsp;end</p>"
        '<a href="/x?a=1&amp;b=2">q</a>'
    ),
    "empty_and_valueless_href": '<a href="">e</a><a href>v</a><a>none</a>',
    "script_style_comment": (
        "<script>var a = 1 < 2;</script><!-- hidden --><style>.c{}</style>"
        "<p>visible</p>"
    ),
    "uppercase_and_quotes": (
        "<A HREF='/UP'>u</A><IMG SRC=\"/I.PNG\"><a href=/unquoted>q</a>"
    ),
    "stray_angle_brackets": "<p>3 < 5 and 7 > 2</p><a href='/ok'>k</a>",
    "self_closed_img_void": '<img src="/a.png"/><br/><img src="/b.png">',
    "whitespace_soup": "<p>\n\t  padded \n</p>\n\n<span>  x  </span>",
    "deeply_nested": "".join(f"<div><a href='/d{i}'>" for i in range(30))
    + "leaf"
    + "</a></div>" * 30,
    "attr_noise": "<a data-x='1' href='/h' href='/dup' broken= >t</a>",
}


@pytest.mark.parametrize("name", sorted(ADVERSARIAL_HTML))
def test_adversarial_html_matches_oracle(name):
    html = ADVERSARIAL_HTML[name]
    spans = parse_html_one(html)
    oracle_spans, oracle_links, oracle_text = parse_page(html)
    assert spans == oracle_spans, f"{name}: span divergence"


def test_adversarial_html_through_spark_udf(spark):
    rows = [(k, v) for k, v in sorted(ADVERSARIAL_HTML.items())]
    df = spark.createDataFrame(rows, "name string, html string")
    got = {
        r["name"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in df.withColumn("spans", parse_html_udf("html")).collect()
    }
    for name, html in ADVERSARIAL_HTML.items():
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in parse_html_one(html)
        ]
        assert got[name] == want, f"{name}: UDF vs local divergence"


def test_nested_anchor_yields_both_links():
    spans = parse_html_one(ADVERSARIAL_HTML["nested_anchors"])
    links = [s["media_ref"] for s in spans if s["kind"] == "link"]
    assert links == ["/outer", "/inner"]


ROBOTS_CASES = {
    "wildcard_path": "User-agent: *\nDisallow: /private/*\nAllow: /private/ok",
    "multi_agent_specific": (
        "User-agent: MyDistributedCrawler\nDisallow: /only-us/\n\n"
        "User-agent: *\nDisallow: /everyone/"
    ),
    "multi_agent_star_first": (
        "User-agent: *\nDisallow: /all/\n\n"
        "User-agent: MyDistributedCrawler\nDisallow: /mine/"
    ),
    "empty_file": "",
    "blank_disallow": "User-agent: *\nDisallow:",
    "disallow_root": "User-agent: *\nDisallow: /",
    "allow_overrides": "User-agent: *\nAllow: /pub/\nDisallow: /",
    "crawl_delay_noise": "User-agent: *\nCrawl-delay: 5\nDisallow: /slow/",
    "comments_and_case": "# note\nUSER-AGENT: *\nDISALLOW: /Upper/\n",
}

TEST_PATHS = [
    "/", "/private/x", "/private/ok", "/only-us/a", "/everyone/a",
    "/all/a", "/mine/a", "/pub/a", "/slow/a", "/Upper/a", "/upper/a",
    "/plain",
]


def test_adversarial_robots_matches_urllib(spark):
    rows = []
    expect = {}
    for case, rules in ROBOTS_CASES.items():
        host = f"{case.replace('_', '-')}.test"
        rp = RobotFileParser()
        rp.parse(rules.splitlines())
        for p in TEST_PATHS:
            url = f"http://{host}{p}"
            rows.append((host, url, rules))
            expect[url] = rp.can_fetch(USER_AGENT, url)
    batch = spark.createDataFrame(
        [(h, u) for h, u, _ in rows], "host string, url string"
    )
    rules_df = spark.createDataFrame(
        sorted({(h, r) for h, _, r in rows}), "host string, rules_txt string"
    )
    got = {
        r["url"]: r["robots_allowed"]
        for r in gate_on_robots(batch, rules_df).collect()
    }
    diffs = {u: (got[u], expect[u]) for u in expect if got[u] != expect[u]}
    assert not diffs, f"robots gate diverges from urllib: {diffs}"
