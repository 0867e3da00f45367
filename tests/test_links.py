"""Outlink extraction / URL resolution / link graph / PageRank
(operators/links.py): hand-expected anchors, an RFC 3986 resolution
differential against stdlib urllib.parse.urljoin, graph normalization,
and PageRank against an independent pure-Python power iteration plus
analytic cases."""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
    extract_links,
    link_graph,
    pagerank,
    resolve_url,
)

PAGE = """<html><body>
<a href="http://other.com/x">absolute</a>
<a href="//cdn.com/lib.js">protocol relative</a>
<a href="/root/path">rooted</a>
<a href="sibling.html">relative</a>
<a href="../up/one.html">dotdot</a>
<a href="?page=2">query only</a>
<a href="#section">fragment only</a>
<a href="mailto:x@y.z">mail</a>
<a href="javascript:void(0)">js</a>
<a href="/keep#frag">fragment stripped</a>
<a href="/nf" rel="external nofollow">no follow</a>
<a href="/styled"><b>bold</b> <i>text</i></a>
</body></html>"""


def test_extract_links_hand_page(spark):
    df = spark.createDataFrame(
        [("http://ex.com/dir/page.html", PAGE)], ["url", "html"]
    )
    rows = {r.href: r for r in extract_links(df).collect()}
    assert set(rows) == {
        "http://other.com/x",
        "http://cdn.com/lib.js",
        "http://ex.com/root/path",
        "http://ex.com/dir/sibling.html",
        "http://ex.com/up/one.html",
        "http://ex.com/dir/page.html?page=2",
        "http://ex.com/keep",
        "http://ex.com/nf",
        "http://ex.com/styled",
    }  # mailto/javascript/fragment-only dropped
    assert rows["http://other.com/x"].anchor_text == "absolute"
    assert rows["http://ex.com/styled"].anchor_text == "bold text"
    assert rows["http://ex.com/nf"].nofollow is True
    assert rows["http://ex.com/keep"].nofollow is False


_bases = st.builds(
    lambda host, segs, q: "http://" + host + "/" + "/".join(segs)
    + ("?" + q if q else ""),
    st.sampled_from(["a.com", "b.org:8080", "x.co.uk"]),
    st.lists(st.sampled_from(["p", "q2", "dir", "x.html"]), max_size=3),
    st.sampled_from(["", "k=v", "a=1&b=2"]),
)
_hrefs = st.one_of(
    st.builds(
        lambda segs, q: "/".join(segs) + ("?" + q if q else ""),
        st.lists(
            st.sampled_from(["u", "..", ".", "v.html", "w w"]),
            min_size=1, max_size=4,
        ),
        st.sampled_from(["", "z=9"]),
    ),
    st.sampled_from([
        "http://abs.com/x", "https://abs.com/", "//cdn.net/j",
        "/rooted", "/a/../b", "?only=q", "x/", "../", "./",
    ]),
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(st.lists(st.tuples(_bases, _hrefs), min_size=1, max_size=8))
def test_resolve_url_matches_urljoin(spark, cases):
    df = spark.createDataFrame(cases, ["base", "href"])
    got = [
        r.out
        for r in df.select(
            resolve_url(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    want = [urljoin(b, h) for b, h in cases]
    assert got == want, cases


def test_link_graph_normalizes_and_honors_nofollow(spark):
    html = (
        '<a href="http://T.com:80/x/?utm_source=z&id=1">t</a>'
        '<a href="/self">s</a>'
        '<a href="http://nf.com/y" rel="nofollow">n</a>'
    )
    df = spark.createDataFrame(
        [("http://me.com/self", html)], ["url", "html"]
    )
    edges = {(r.src, r.dst) for r in link_graph(df).collect()}
    # tracking param dropped + port/case/trailing-slash normalized;
    # the self-link collapses to a self-loop and is dropped; nofollow
    # edge excluded
    assert edges == {("http://me.com/self", "http://t.com/x?id=1")}
    with_nf = {
        (r.src, r.dst) for r in link_graph(df, follow_only=False).collect()
    }
    assert ("http://me.com/self", "http://nf.com/y") in with_nf


def _py_pagerank(edges, d=0.85, iters=200):
    """Independent reference: dict-based power iteration with uniform
    dangling redistribution."""
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, t in set(edges):
        out.setdefault(s, set()).add(t)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dangling = sum(rank[x] for x in nodes if x not in out)
        nxt = {x: (1 - d) / n + d * dangling / n for x in nodes}
        for s, ts in out.items():
            for t in ts:
                nxt[t] += d * rank[s] / len(ts)
        rank = nxt
    return rank


def test_pagerank_matches_reference_and_analytic_cases(spark):
    import random

    # a directed cycle is exactly uniform
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(cyc, "src long, dst long")
        ).collect()
    }
    for v in got.values():
        assert abs(v - 0.2) < 1e-6
    # random graphs vs the independent implementation (dangling nodes
    # included: node ids that never appear as src)
    rng = random.Random(7)
    edges = list({
        (rng.randrange(12), rng.randrange(12)) for _ in range(30)
    })
    edges = [(s, t) for s, t in edges if s != t]
    got = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(edges, "src long, dst long"),
            tol=1e-10, max_iters=300,
        ).collect()
    }
    want = _py_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k
    assert abs(sum(got.values()) - 1.0) < 1e-6

    # star: the hub soaks rank from every leaf
    star = [(i, 99) for i in range(1, 6)]
    r = {
        x.node: x.rank
        for x in pagerank(
            spark.createDataFrame(star, "src long, dst long")
        ).collect()
    }
    assert r[99] == max(r.values())

    # the star's dangling hub makes convergence geometric at rate d —
    # one round cannot reach 1e-15
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(
            spark.createDataFrame(star, "src long, dst long"),
            max_iters=1, tol=1e-15,
        )
    # max_iters=0 raises the same RuntimeError (delta never measured),
    # not a NameError from the unbound loop variable
    with pytest.raises(RuntimeError, match="unmeasured"):
        pagerank(
            spark.createDataFrame(star, "src long, dst long"),
            max_iters=0,
        )


def test_build_frontier_splice(spark):
    """Frontier = outlinks minus crawled (canonical-key anti-join),
    robots-gated, per-host capped — the splice of links + urls +
    robots the crawl loop runs between rounds."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import build_frontier
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import parse_robots_txt

    good = spark.createDataFrame(
        [
            (["http://a.com/new1", "http://a.com/new2?utm_source=x",
              "http://a.com/seen", "http://b.com/private/x",
              "http://b.com/ok"],),
            (["http://a.com/new1#dup", "http://c.com/1",
              "http://c.com/2", "http://c.com/3"],),
        ],
        "outlinks array<string>",
    )
    # wait: outlinks arrive fragment-stripped from outlink_array; the
    # #dup here pins that build_frontier's canonical key ALSO collapses
    crawled = spark.createDataFrame(
        [("http://A.com/seen?utm_campaign=y",)], ["url"]
    )
    rules = parse_robots_txt(
        spark.createDataFrame(
            [("b.com", "User-agent: *\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    out = build_frontier(good, rules=rules, crawled=crawled)
    urls = {r.url for r in out.collect()}
    assert "http://a.com/seen" not in urls          # crawled (variant)
    assert "http://b.com/private/x" not in urls     # robots-blocked
    assert {"http://b.com/ok", "http://c.com/1"} <= urls
    # fragment variant collapsed with its twin: exactly one of them
    assert len([u for u in urls if u.startswith("http://a.com/new1")]) == 1

    capped = build_frontier(good, crawled=crawled, max_per_host=2)
    from collections import Counter

    hosts = Counter(
        u.split("/")[2].lower() for u in
        (r.url for r in capped.collect())
    )
    assert all(v <= 2 for v in hosts.values())
    assert hosts["c.com"] == 2


def test_anchor_text_index(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import anchor_text_index

    rows = [
        ("http://t.com/a", "Great Page"),
        ("http://t.com/a", "great page"),
        ("http://t.com/a", "click"),
        ("http://t.com/a", None),          # textless inlink still counts
        ("http://t.com/b", "other"),
    ]
    links = spark.createDataFrame(rows, "href string, anchor_text string")
    got = {r.url: r for r in anchor_text_index(links, k=1).collect()}
    a = got["http://t.com/a"]
    assert a.n_inlinks == 4
    assert [(s["text"], s["n"]) for s in a.anchor_texts] == [
        ("great page", 2)
    ]
    assert got["http://t.com/b"].n_inlinks == 1


def test_anchor_text_index_textless_target_keeps_row(spark):
    """Review fix: a target whose every inlink is textless must keep
    its n_inlinks row (empty anchor_texts), not vanish."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import anchor_text_index

    links = spark.createDataFrame(
        [("http://t.com/img", None), ("http://t.com/img", None)],
        "href string, anchor_text string",
    )
    rows = anchor_text_index(links).collect()
    assert len(rows) == 1
    assert rows[0].n_inlinks == 2 and rows[0].anchor_texts == []


def test_schedule_fetches_politeness(spark):
    """Per-host fetch slots honor crawl-delay: specific-UA beats '*',
    unparseable delays fall back to the default, offsets are
    slot × delay, and slot order is the md5 dice (deterministic)."""
    import hashlib

    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
        schedule_fetches,
    )

    urls = ["http://a.com/1", "http://a.com/2", "http://a.com/3",
            "http://b.com/x"]
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    directives = spark.createDataFrame(
        [("a.com", "crawl-delay", "*", "2.5"),
         ("a.com", "crawl-delay", "mybot", "0.5"),
         ("b.com", "crawl-delay", "*", "oops"),
         ("a.com", "sitemap", None, "http://a.com/s.xml")],
        "host string, kind string, user_agent string, value string",
    )
    got = {
        r.url: (r.host, r.fetch_slot, r.crawl_delay, r.planned_offset_s)
        for r in schedule_fetches(
            frontier, directives, user_agent="mybot"
        ).collect()
    }
    # md5 ordering of a.com's three URLs, recomputed independently
    a_sorted = sorted(
        [u for u in urls if u.startswith("http://a.com")],
        key=lambda u: hashlib.md5(u.encode()).hexdigest(),
    )
    for slot, u in enumerate(a_sorted):
        assert got[u] == ("a.com", slot, 0.5, slot * 0.5)
    # b.com's '*' delay does not parse → default_delay 1.0
    assert got["http://b.com/x"] == ("b.com", 0, 1.0, 0.0)
    # a delay scoped to ANOTHER bot never applies to this agent, and
    # non-positive delays fall back to the default like parse failures
    other = spark.createDataFrame(
        [("a.com", "crawl-delay", "slowbot", "0.1"),
         ("b.com", "crawl-delay", "*", "-5")],
        "host string, kind string, user_agent string, value string",
    )
    scoped = {
        r.url: r.crawl_delay
        for r in schedule_fetches(frontier, other).collect()
    }
    assert scoped["http://a.com/1"] == 1.0  # slowbot's 0.1 ignored
    assert scoped["http://b.com/x"] == 1.0  # -5 rejected
    # generic agent: '*' applies (2.5s), capped at max_delay
    star = {
        r.url: r.crawl_delay
        for r in schedule_fetches(frontier, directives).collect()
    }
    assert star["http://a.com/1"] == 2.5
    # no directives at all → default everywhere
    plain = schedule_fetches(frontier).collect()
    assert all(r.crawl_delay == 1.0 for r in plain)


def _py_hits(edges, iters=300):
    """Independent reference: dict-based HITS with L1 normalization."""
    nodes = sorted({x for e in edges for x in e})
    out, inc = {}, {}
    for s, t in set(edges):
        out.setdefault(s, set()).add(t)
        inc.setdefault(t, set()).add(s)
    hub = {x: 1.0 / len(nodes) for x in nodes}
    auth = dict(hub)
    for _ in range(iters):
        auth = {x: sum(hub[s] for s in inc.get(x, ())) for x in nodes}
        z = sum(auth.values()) or 1.0
        auth = {x: v / z for x, v in auth.items()}
        hub = {x: sum(auth[t] for t in out.get(x, ())) for x in nodes}
        z = sum(hub.values()) or 1.0
        hub = {x: v / z for x, v in hub.items()}
    return hub, auth


def test_hits_matches_reference_and_analytic_cases(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import hits

    # complete bipartite K_{2,3}: hubs split 1/2 each, auths 1/3 each
    kb = [(h, a) for h in (1, 2) for a in (10, 20, 30)]
    got = {
        r.node: (r.hub, r.authority)
        for r in hits(
            spark.createDataFrame(kb, "src long, dst long"), tol=1e-9
        ).collect()
    }
    for h in (1, 2):
        assert abs(got[h][0] - 0.5) < 1e-6 and got[h][1] == 0.0
    for a in (10, 20, 30):
        assert got[a][0] == 0.0 and abs(got[a][1] - 1 / 3) < 1e-6

    # random graph vs the independent implementation
    import random

    rng = random.Random(13)
    edges = list({
        (rng.randrange(10), rng.randrange(10)) for _ in range(25)
    })
    edges = [(s, t) for s, t in edges if s != t]
    got = {
        r.node: (r.hub, r.authority)
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long"),
            tol=1e-10, max_iters=400,
        ).collect()
    }
    hub, auth = _py_hits(edges)
    assert set(got) == set(hub)
    for k in hub:
        assert abs(got[k][0] - hub[k]) < 1e-5, ("hub", k)
        assert abs(got[k][1] - auth[k]) < 1e-5, ("auth", k)


def test_pagerank_warm_start_same_fixed_point(spark):
    """Warm-starting from a previous result converges to the SAME
    ranks (the fixed point is unique), handles new nodes entering at
    uniform, ignores stale nodes, and renormalizes the seed; a
    converged seed re-converges within one check segment."""
    import random

    rng = random.Random(11)
    edges = list({
        (rng.randrange(10), rng.randrange(10)) for _ in range(25)
    })
    edges = [(s, t) for s, t in edges if s != t]
    e1 = spark.createDataFrame(edges, "src long, dst long")
    cold = pagerank(e1, tol=1e-10, max_iters=300)
    warm = pagerank(e1, tol=1e-10, max_iters=300, init=cold)
    c = {r.node: r.rank for r in cold.collect()}
    w = {r.node: r.rank for r in warm.collect()}
    assert set(c) == set(w)
    for k in c:
        assert abs(c[k] - w[k]) < 1e-8, k

    # grow the graph: a new node 99 hanging off node 0 — warm start
    # from the OLD result (99 absent, every old node present)
    e2 = spark.createDataFrame(
        edges + [(0, 99)], "src long, dst long"
    )
    grown_cold = {
        r.node: r.rank
        for r in pagerank(e2, tol=1e-10, max_iters=300).collect()
    }
    grown_warm = {
        r.node: r.rank
        for r in pagerank(
            e2, tol=1e-10, max_iters=300, init=cold
        ).collect()
    }
    assert set(grown_cold) == set(grown_warm)
    for k in grown_cold:
        assert abs(grown_cold[k] - grown_warm[k]) < 1e-7, k
    assert abs(sum(grown_warm.values()) - 1.0) < 1e-8

    # stale seed nodes (a shrunk graph) are ignored
    e3 = spark.createDataFrame(edges[:5], "src long, dst long")
    shrunk = {
        r.node: r.rank
        for r in pagerank(
            e3, tol=1e-10, max_iters=300, init=cold
        ).collect()
    }
    want = {
        r.node: r.rank
        for r in pagerank(e3, tol=1e-10, max_iters=300).collect()
    }
    assert set(shrunk) == set(want)
    for k in want:
        assert abs(shrunk[k] - want[k]) < 1e-8, k


def test_personalized_pagerank(spark):
    """Personalized teleport: ranks match an independent Python PPR
    (teleport AND dangling mass flow to the weighted nodes), weights
    renormalize over matched nodes, and an unmatched-only
    personalization raises."""
    import random

    import pytest as _pytest

    def py_ppr(edges, weights, d=0.85, iters=400):
        nodes = sorted({x for e in edges for x in e})
        z = sum(weights.get(x, 0.0) for x in nodes)
        p = {x: weights.get(x, 0.0) / z for x in nodes}
        out = {}
        for s_, t_ in set(edges):
            out.setdefault(s_, set()).add(t_)
        rank = {x: 1.0 / len(nodes) for x in nodes}
        for _ in range(iters):
            dang = sum(rank[x] for x in nodes if x not in out)
            nxt = {x: (1 - d) * p[x] + d * dang * p[x] for x in nodes}
            for s_, ts in out.items():
                for t_ in ts:
                    nxt[t_] += d * rank[s_] / len(ts)
            rank = nxt
        return rank

    rng = random.Random(23)
    edges = list({
        (rng.randrange(9), rng.randrange(9)) for _ in range(22)
    })
    edges = [(s, t) for s, t in edges if s != t]
    weights = {0: 3.0, 4: 1.0, 777: 9.0}  # 777 not in the graph
    e = spark.createDataFrame(edges, "src long, dst long")
    pers = spark.createDataFrame(
        list(weights.items()), "node long, weight double"
    )
    got = {
        r.node: r.rank
        for r in pagerank(
            e, tol=1e-10, max_iters=400, personalization=pers
        ).collect()
    }
    want = py_ppr(edges, weights)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, k
    assert abs(sum(got.values()) - 1.0) < 1e-8
    # every weighted node in-graph beats its unpersonalized self is
    # not guaranteed in general, but the teleport targets must carry
    # positive rank
    assert got[0] > 0 and got[4] > 0

    with _pytest.raises(ValueError, match="match no graph node"):
        pagerank(
            e,
            personalization=spark.createDataFrame(
                [(777, 1.0)], "node long, weight double"
            ),
        )


def test_build_frontier_seeds(spark):
    """Sitemap/hand-curated seeds union into the frontier before the
    canonical-key dedup, the crawled anti-join, and the robots gate."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
        build_frontier,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import (
        parse_robots_txt,
    )

    good = spark.createDataFrame(
        [(["http://a.com/found"],)], "outlinks array<string>"
    )
    seeds = spark.createDataFrame(
        [("http://a.com/seeded",),
         ("http://a.com/found?utm_source=x",),   # dup of discovered
         ("http://a.com/crawled",),              # already crawled
         ("http://a.com/private/x",)],           # robots-blocked
        "url string",
    )
    crawled = spark.createDataFrame(
        [("http://a.com/crawled",)], "url string"
    )
    rules = parse_robots_txt(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    got = {
        r.url
        for r in build_frontier(
            good, rules=rules, crawled=crawled, seeds=seeds
        ).collect()
    }
    assert got == {"http://a.com/found", "http://a.com/seeded"}


class TestStructuredMetadata:
    """OpenGraph + JSON-LD extraction (round-11 sixth pass) — pinned
    on hand-authored page snippets."""

    def test_opengraph(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
            opengraph_metadata,
        )
        from pyspark.sql import functions as F

        page = (
            '<html><head>'
            '<meta content="Brewing &amp; You" property="og:title">'
            "<meta property='og:type' content='article'>"
            '<meta property="article:published_time" '
            'content="2026-08-01T10:00:00Z">'
            "</head><body/></html>"
        )
        df = spark.createDataFrame([(page,)], "html string")
        m = df.select(opengraph_metadata(F.col("html")).alias("m")) \
            .collect()[0]["m"]
        # attribute order swapped on og:title; entity decoded
        assert m["og_title"] == "Brewing & You"
        assert m["og_type"] == "article"
        assert m["article_published"] == "2026-08-01T10:00:00Z"
        assert m["og_image"] is None

    def test_jsonld_article_and_graph_wrapper(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
            jsonld_metadata,
        )
        from pyspark.sql import functions as F

        direct = (
            '<script type="application/ld+json">'
            '{"@type": "NewsArticle", "headline": "Beans up 3%",'
            ' "author": {"name": "Ada"},'
            ' "datePublished": "2026-08-02"}'
            "</script>"
        )
        graph = (
            "<script type=application/ld+json>"
            '{"@graph": [{"@type": "Recipe", "name": "Pour over",'
            ' "author": "Bo"}]}'
            "</script>"
        )
        broken = '<script type="application/ld+json">{oops</script>'
        df = spark.createDataFrame(
            [(1, direct), (2, graph), (3, broken), (4, "<p>none</p>")],
            "id long, html string")
        got = {r["id"]: r["m"] for r in df.select(
            "id", jsonld_metadata(F.col("html")).alias("m")).collect()}
        assert got[1]["ld_type"] == "NewsArticle"
        assert got[1]["headline"] == "Beans up 3%"
        assert got[1]["author"] == "Ada"
        assert got[1]["date_published"] == "2026-08-02"
        assert got[2]["ld_type"] == "Recipe"
        assert got[2]["headline"] == "Pour over"
        assert got[2]["author"] == "Bo"
        assert got[3]["ld_type"] is None  # unparseable: absence
        assert got[4]["headline"] is None

    def test_jsonld_top_level_array(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
            jsonld_metadata,
        )
        from pyspark.sql import functions as F

        page = ('<script type="application/ld+json">'
                '[{"@type": "NewsArticle", "headline": "Array form"}]'
                "</script>")
        df = spark.createDataFrame([(page,)], "html string")
        m = df.select(jsonld_metadata(F.col("html")).alias("m")) \
            .collect()[0]["m"]
        assert m["ld_type"] == "NewsArticle"
        assert m["headline"] == "Array form"
