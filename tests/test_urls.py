"""URL/domain operators (operators/urls.py): the normalization recipe
against an independent urllib.parse-based Python model over
hypothesis-generated structured URLs, eTLD+1 heuristics, the domain
report's share math, and the broadcast blocklist anti-join."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.urls import (
    TRACKING_PARAMS,
    domain_report,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_host,
)


def _model_normalize(url: str) -> str | None:
    parts = urlsplit(url)
    host = parts.hostname  # lowercased, port and userinfo stripped
    if not host:
        return None
    path = parts.path
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    if path == "/":
        path = ""
    params = [
        p
        for p in parts.query.split("&")
        if p and p.split("=")[0].lower() not in TRACKING_PARAMS
    ]
    q = "&".join(sorted(params))
    return f"{parts.scheme.lower()}://{host}{path}" + (
        f"?{q}" if q else ""
    )


_label = st.sampled_from(["example", "news", "cdn", "a1", "x"])
_keys = st.sampled_from(
    ["q", "page", "id", "utm_source", "UTM_Campaign", "gclid", "sort"]
)
_vals = st.sampled_from(["1", "abc", "z9", ""])


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP"]))
    labels = draw(st.lists(_label, min_size=1, max_size=3))
    suffix = draw(st.sampled_from(["com", "org", "co.uk", "de"]))
    host = ".".join(labels + [suffix])
    port = draw(st.sampled_from(["", ":80", ":8080"]))
    segs = draw(
        st.lists(st.sampled_from(["p", "q2", "index.html"]),
                 min_size=0, max_size=3)
    )
    path = ("/" + "/".join(segs)) if segs else draw(
        st.sampled_from(["", "/"])
    )
    if segs and draw(st.booleans()):
        path += "/"
    n_params = draw(st.integers(0, 4))
    params = "&".join(
        f"{draw(_keys)}={draw(_vals)}" for _ in range(n_params)
    )
    frag = draw(st.sampled_from(["", "#top", "#sec-2"]))
    url = f"{scheme}://{host}{port}{path}"
    if params:
        url += "?" + params
    return url + frag


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(st.lists(_urls(), min_size=1, max_size=8))
def test_normalize_matches_urllib_model(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["n"]
        for r in df.select(normalize_url("url").alias("n")).collect()
    ]
    want = [_model_normalize(u) for u in urls]
    assert got == want, (urls, got, want)


def test_normalization_recipe_examples(spark):
    rows = [
        # tracking params dropped, survivors sorted, fragment gone
        ("HTTPS://News.Example.COM:443/a/b/?z=1&utm_source=x&a=2#frag",
         "https://news.example.com/a/b?a=2&z=1"),
        # bare host, trailing slash, default port
        ("http://Example.com:80/", "http://example.com"),
        # only tracking params -> no query at all
        ("http://a.com/p?gclid=123&UTM_CAMPAIGN=y", "http://a.com/p"),
        # unparseable -> NULL, never a crash
        ("not a url at all", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"])
    got = [
        r["n"]
        for r in df.select(normalize_url("url").alias("n")).collect()
    ]
    assert got == [w for _, w in rows]
    # identical content under different tracking params dedups to one
    # key — the operator's whole purpose
    a = "http://a.com/doc?id=7&utm_source=tw"
    b = "HTTP://A.com:80/doc/?utm_campaign=x&id=7"
    two = spark.createDataFrame([(a,), (b,)], ["url"])
    keys = {
        r["n"] for r in two.select(normalize_url("url").alias("n")).collect()
    }
    assert keys == {"http://a.com/doc?id=7"}


def test_registered_domain_heuristic(spark):
    rows = [
        ("http://www.example.co.uk/p", "example.co.uk"),
        ("https://a.b.news.com/x", "news.com"),
        ("http://localhost/x", "localhost"),
        ("http://sub.site.de", "site.de"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"])
    got = [
        r["d"]
        for r in df.select(registered_domain("url").alias("d")).collect()
    ]
    assert got == [w for _, w in rows]


def test_ipv6_literal_hosts(spark):
    """Bracketed IPv6 hosts keep their brackets with the port
    stripped; registered_domain passes them through unchanged (IP
    literals have no registrable labels) — the ':'-split port strip
    must not mangle them into '['."""
    rows = [
        ("http://[::1]:8080/path", "[::1]", "[::1]"),
        ("http://[2001:db8::2]/x", "[2001:db8::2]", "[2001:db8::2]"),
        # IPv4-mapped form contains dots: still no label split
        (
            "http://[::ffff:192.0.2.1]:80/",
            "[::ffff:192.0.2.1]",
            "[::ffff:192.0.2.1]",
        ),
        ("http://host.com:8080/x", "host.com", "host.com"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in rows], ["url"])
    got = df.select(
        url_host("url").alias("h"),
        registered_domain("url").alias("d"),
    ).collect()
    assert [(r["h"], r["d"]) for r in got] == [
        (h, d) for _, h, d in rows
    ]


def test_registered_domain_psl(spark):
    """Full public-suffix-list semantics on a PSL slice including
    wildcard and exception rules, checked against the published
    algorithm's documented outcomes; the plan stays a pure projection
    (the list rides the plan as one constant-folded map literal —
    no join, no shuffle, no Python)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.urls import (
        registered_domain_psl,
    )

    psl = [
        "// ===BEGIN ICANN DOMAINS===",  # comment lines ignored
        "com", "org", "net", "edu", "gov", "io", "de", "jp", "uk",
        "co.uk", "org.uk", "ac.uk", "gov.uk", "sch.uk",
        "com.au", "net.au", "org.au", "edu.au",
        "co.jp", "ne.jp", "or.jp", "kawasaki.jp",
        "*.ck", "!www.ck",
        "*.kawasaki.jp", "!city.kawasaki.jp",
        "com.br", "net.br", "gov.br",
        "github.io",  # a private-section multi-label suffix
        "",  # blank lines ignored
    ] + [f"tld{i}" for i in range(70)]  # pad toward real-PSL scale
    cases = [
        ("http://www.example.com/x", "example.com"),
        ("http://a.b.example.co.uk/", "example.co.uk"),
        ("http://example.co.uk", "example.co.uk"),
        # host IS a public suffix -> NULL
        ("http://co.uk/", None),
        ("http://com/", None),
        # wildcard: *.ck makes <anything>.ck a public suffix
        ("http://foo.www2.ck/x", "foo.www2.ck"),
        ("http://a.foo.www2.ck/x", "foo.www2.ck"),
        ("http://www2.ck/", None),
        # exception: !www.ck carves www.ck back out as registrable
        ("http://www.ck/", "www.ck"),
        ("http://sub.www.ck/", "www.ck"),
        # exception over a 3-label wildcard
        ("http://city.kawasaki.jp/", "city.kawasaki.jp"),
        ("http://sub.city.kawasaki.jp/", "city.kawasaki.jp"),
        ("http://other.kawasaki.jp/", None),  # *.kawasaki.jp suffix
        ("http://x.other.kawasaki.jp/", "x.other.kawasaki.jp"),
        # private-section multi-label suffix
        ("http://user.github.io/repo", "user.github.io"),
        ("http://a.user.github.io/", "user.github.io"),
        # unknown TLD: the implicit * rule (last two labels)
        ("http://foo.bar.unknowntld/", "bar.unknowntld"),
        ("http://unknowntld/", None),
        # junk and IP literals -> NULL
        ("not a url", None),
        ("http://[::1]:8080/", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    out = df.select(registered_domain_psl("url", psl).alias("d"))
    got = [r["d"] for r in out.collect()]
    assert got == [w for _, w in cases], list(
        zip([u for u, _ in cases], got, [w for _, w in cases])
    )
    # a DataFrame suffix table works identically
    sdf = spark.createDataFrame([(r,) for r in psl], ["rule"])
    got2 = [
        r["d"]
        for r in df.select(
            registered_domain_psl("url", sdf).alias("d")
        ).collect()
    ]
    assert got2 == got
    # parity with the heuristic on its own default multi-suffix set
    # (multi-label hosts under known suffixes agree; the documented
    # divergence is bare/unknown hosts)
    heur_cases = [
        "http://www.example.co.uk/p",
        "https://a.b.news.com/x",
        "http://sub.site.de",
    ]
    hdf = spark.createDataFrame([(u,) for u in heur_cases], ["url"])
    both = hdf.select(
        registered_domain("url").alias("h"),
        registered_domain_psl("url", psl).alias("p"),
    ).collect()
    assert all(r["h"] == r["p"] for r in both), both
    # plan: a pure projection — no exchange, no join, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Join", "BatchEvalPython", "ArrowEval"):
        assert node not in plan, plan


def test_domain_report_and_blocklist(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://a.spam.com/1", "w1 w2"),
            (2, "http://b.spam.com/2", "w1 w2 w3"),
            (3, "http://good.org/1", "w1"),
            (4, "http://also.good.org/2", "w1 w2"),
        ],
        ["doc_id", "url", "text"],
    )
    rep = {r["domain"]: r for r in domain_report(docs).collect()}
    assert rep["spam.com"]["n_docs"] == 2
    assert rep["spam.com"]["doc_share"] == 0.5
    assert rep["spam.com"]["n_tokens"] == 5
    assert rep["spam.com"]["token_share"] == pytest.approx(5 / 8)
    block = spark.createDataFrame([("Spam.com",)], ["domain"])
    kept = filter_blocked_domains(docs, block)
    assert {r["doc_id"] for r in kept.collect()} == {3, 4}
    # plan: the anti-join broadcasts the blocklist side
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the whole normalize expression is JVM-side: no Python stages
    nplan = (
        docs.select(normalize_url("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for py_node in ("BatchEvalPython", "ArrowEvalPython",
                    "MapInPandas", "FlatMapGroupsInPandas"):
        assert py_node not in nplan
    assert "ParseUrlEvaluator" in nplan  # the JVM parse, in-plan
