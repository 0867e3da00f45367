"""robots.txt parsing + gating (operators/robots.py): RFC 9309
semantics pinned by hand (longest-match, allow-on-tie, wildcards, $
anchor, UA group selection), and a differential against stdlib
urllib.robotparser on generated NON-OVERLAPPING policies (robotparser
is first-match-in-file-order, the RFC is longest-match — they agree
exactly when no pattern prefixes another, which the generator
guarantees)."""

from __future__ import annotations

import urllib.robotparser

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import (
    parse_robots_rules,
    parse_robots_txt,
    robots_gate,
)


def _gate(spark, robots_body, urls, ua="*"):
    rules = parse_robots_txt(
        spark.createDataFrame(
            [("ex.com", robots_body)], "host string, body string"
        )
    )
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = robots_gate(df, rules, user_agent=ua)
    return {r.url: r.allowed for r in out.collect()}


def test_longest_match_and_allow_tie(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow: /private/ok/no\n"
    )
    got = _gate(spark, body, [
        "http://ex.com/private/x",        # /private wins -> blocked
        "http://ex.com/private/ok/page",  # /private/ok wins -> allowed
        "http://ex.com/private/ok/no/p",  # longest disallow -> blocked
        "http://ex.com/public",           # no rule matches -> allowed
        "http://other.com/private/x",     # no rules for host -> allowed
    ])
    assert got == {
        "http://ex.com/private/x": False,
        "http://ex.com/private/ok/page": True,
        "http://ex.com/private/ok/no/p": False,
        "http://ex.com/public": True,
        "http://other.com/private/x": True,
    }
    # allow wins an exact-length tie (RFC 9309 §2.2.2)
    tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert _gate(spark, tie, ["http://ex.com/dir/x"]) == {
        "http://ex.com/dir/x": True
    }


def test_wildcards_and_anchor(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp/*/draft\n"
    )
    got = _gate(spark, body, [
        "http://ex.com/docs/x.pdf",      # $-anchored wildcard hits
        "http://ex.com/docs/x.pdfs",     # $ anchor: no match
        "http://ex.com/tmp/a/draft",     # inner wildcard hits
        "http://ex.com/tmp/a/b/draftz",  # * spans segments, prefix ok
        "http://ex.com/tmp/draft",       # needs something between
    ])
    assert got == {
        "http://ex.com/docs/x.pdf": False,
        "http://ex.com/docs/x.pdfs": True,
        "http://ex.com/tmp/a/draft": False,
        "http://ex.com/tmp/a/b/draftz": False,
        "http://ex.com/tmp/draft": True,
    }


def test_user_agent_group_selection(spark):
    body = (
        "User-agent: alphabot\n"
        "Disallow: /alpha\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /all\n"
    )
    # the specific group REPLACES * for that agent (RFC: one group)
    got = _gate(spark, body, [
        "http://ex.com/alpha/x", "http://ex.com/all/x",
    ], ua="AlphaBot")
    assert got == {
        "http://ex.com/alpha/x": False,
        "http://ex.com/all/x": True,  # * group does not stack
    }
    got_star = _gate(spark, body, [
        "http://ex.com/alpha/x", "http://ex.com/all/x",
    ])
    assert got_star == {
        "http://ex.com/alpha/x": True,
        "http://ex.com/all/x": False,
    }
    # stacked UA lines share the following rules; empty Disallow =
    # allow-all but the group EXISTS (shields the agent from *)
    body2 = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: c\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    )
    assert _gate(spark, body2, ["http://ex.com/x/1"], ua="b") == {
        "http://ex.com/x/1": False
    }
    assert _gate(spark, body2, ["http://ex.com/x/1"], ua="c") == {
        "http://ex.com/x/1": True
    }
    assert _gate(spark, body2, ["http://ex.com/x/1"], ua="nobody") == {
        "http://ex.com/x/1": False
    }


def test_parse_rules_unit():
    rules = parse_robots_rules(
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /a # trailing comment\n"
        "Sitemap: http://ex.com/map.xml\n"
        "Allow: /a/b\n"
        "Crawl-delay: 10\n"
    )
    assert rules == [("*", False, "/a"), ("*", True, "/a/b")]
    assert parse_robots_rules("Disallow: /orphan\n") == []


# distinct single-segment prefixes -> no pattern prefixes another, so
# first-match (robotparser) == longest-match (RFC)
_segs = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def _policy(draw):
    n = draw(st.integers(1, len(_segs)))
    segs = draw(st.permutations(_segs))[:n]
    rules = []
    for s in segs:
        kind = draw(st.sampled_from(["Disallow", "Allow"]))
        deep = draw(st.booleans())
        rules.append((kind, f"/{s}/sub" if deep else f"/{s}"))
    body = "User-agent: *\n" + "".join(
        f"{k}: {p}\n" for k, p in rules
    )
    return body


_paths = st.lists(
    st.builds(
        lambda s, tail: f"/{s}{tail}",
        st.sampled_from(_segs + ["zeta"]),
        st.sampled_from(["", "/x", "/sub", "/sub/deep", ".html"]),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_policy(), _paths)
def test_gate_matches_stdlib_robotparser(spark, body, paths):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    urls = [f"http://ex.com{p}" for p in paths]
    got = _gate(spark, body, urls)
    want = {u: rp.can_fetch("*", u) for u in urls}
    assert got == want, body


def test_sitemap_urls(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import sitemap_urls

    urlset = """<?xml version="1.0" encoding="UTF-8"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://ex.com/a?x=1&amp;y=2</loc>
           <lastmod>2026-01-05</lastmod><priority>0.8</priority></url>
      <url><loc><![CDATA[http://ex.com/cdata?a=1&b=2]]></loc></url>
      <url><priority>0.1</priority></url>
    </urlset>"""
    index = """<sitemapindex>
      <sitemap><loc>http://ex.com/sitemap-1.xml.gz</loc>
               <lastmod>2026-02-01</lastmod></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(
        [("ex.com", urlset), ("ex.com", index)], ["host", "body"]
    )
    rows = sitemap_urls(df).collect()
    got = {(r.kind, r.loc, r.lastmod) for r in rows}
    assert got == {
        ("url", "http://ex.com/a?x=1&y=2", "2026-01-05"),
        ("url", "http://ex.com/cdata?a=1&b=2", None),
        ("sitemap", "http://ex.com/sitemap-1.xml.gz", "2026-02-01"),
    }
    # the host column rides through
    assert all(r.host == "ex.com" for r in rows)


def test_robots_directives(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import (
        parse_robots_directives,
        robots_directives,
    )

    body = (
        "User-agent: alphabot\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
        "Sitemap: http://ex.com/map.xml\n"
    )
    assert parse_robots_directives(body) == [
        ("crawl-delay", "alphabot", "2"),
        ("crawl-delay", "*", "10"),
        ("sitemap", None, "http://ex.com/map.xml"),
    ]
    rows = robots_directives(
        spark.createDataFrame([("ex.com", body)],
                              "host string, body string")
    ).collect()
    got = {(r.kind, r.user_agent, r.value) for r in rows}
    assert got == {
        ("crawl-delay", "alphabot", "2"),
        ("crawl-delay", "*", "10"),
        ("sitemap", None, "http://ex.com/map.xml"),
    }


def test_rules_match_query_string(spark):
    """Review fix: RFC 9309 matches path AND query — 'Disallow:
    /search?q=' must block matching queries, and a $-anchored rule
    must see the query too."""
    body = (
        "User-agent: *\n"
        "Disallow: /search?q=\n"
        "Disallow: /*.php$\n"
    )
    got = _gate(spark, body, [
        "http://ex.com/search?q=x",    # query rule hits
        "http://ex.com/search",        # no query: rule needs '?q='
        "http://ex.com/x.php",         # $ anchor: blocked
        "http://ex.com/x.php?id=1",    # $ must see '?id=1': allowed
    ])
    assert got == {
        "http://ex.com/search?q=x": False,
        "http://ex.com/search": True,
        "http://ex.com/x.php": False,
        "http://ex.com/x.php?id=1": True,
    }
    # robotparser agrees on the query-bearing prefix rule
    import urllib.robotparser as urp

    rp = urp.RobotFileParser()
    rp.parse("User-agent: *\nDisallow: /search?q=\n".splitlines())
    assert rp.can_fetch("*", "http://ex.com/search?q=x") is False
    assert rp.can_fetch("*", "http://ex.com/search") is True


def test_empty_allow_group_shields_agent(spark):
    """Review fix: a group whose only line is an empty Allow: still
    EXISTS, so its agent is shielded from the * group (parity with
    the empty-Disallow idiom)."""
    body = (
        "User-agent: c\nAllow:\n\nUser-agent: *\nDisallow: /\n"
    )
    assert _gate(spark, body, ["http://ex.com/x"], ua="c") == {
        "http://ex.com/x": True
    }
    assert _gate(spark, body, ["http://ex.com/x"]) == {
        "http://ex.com/x": False
    }
