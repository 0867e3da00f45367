"""Feed parsing (`operators/feeds.py`): hand-authored RSS 2.0 and
Atom documents per their public specs; expectations hand-derived."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.feeds import (
    feed_entries,
    feed_metadata,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Coffee News</title>
<link>http://cn.example/</link>
<item>
  <title>Beans &amp; Prices</title>
  <link>http://cn.example/a1</link>
  <pubDate>Sat, 15 Aug 2026 10:00:00 GMT</pubDate>
  <description><![CDATA[Prices <b>rose</b> today.]]></description>
</item>
<item>
  <title>No link item</title>
  <description>dropped: nothing to fetch</description>
</item>
<item>
  <title>Second</title>
  <link>http://cn.example/a2</link>
</item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Roast Blog</title>
<link rel="self" href="http://rb.example/feed.xml"/>
<link rel="alternate" href="http://rb.example/"/>
<entry>
  <title>Light roasts</title>
  <link rel="enclosure" href="http://rb.example/audio.mp3"/>
  <link href="http://rb.example/p1"/>
  <updated>2026-08-10T00:00:00Z</updated>
  <summary>Why light roasts taste brighter.</summary>
</entry>
<entry>
  <title>Dark roasts</title>
  <link rel="alternate" href="http://rb.example/p2"/>
  <published>2026-08-12T00:00:00Z</published>
</entry>
</feed>"""


def _entries(spark, body):
    df = spark.createDataFrame([("u", body)], "feed_url string, body string")
    return feed_entries(df).orderBy("link").collect()


class TestRss:
    def test_items_entities_cdata_and_dropped_linkless(self, spark):
        rows = _entries(spark, RSS)
        assert len(rows) == 2  # the linkless item dropped
        a1, a2 = rows
        assert a1.feed_url == "u"  # passthrough column
        assert a1.feed_kind == "rss"
        assert a1.title == "Beans & Prices"
        assert a1.link == "http://cn.example/a1"
        assert a1.published == "Sat, 15 Aug 2026 10:00:00 GMT"
        assert a1.summary == "Prices <b>rose</b> today."  # CDATA raw html
        assert a2.title == "Second" and a2.published is None

    def test_channel_metadata_not_shadowed_by_items(self, spark):
        df = spark.createDataFrame([(RSS,)], "body string")
        m = feed_metadata(df).collect()[0]["feed"]
        assert m["title"] == "Coffee News"
        assert m["site_link"] == "http://cn.example/"
        assert m["feed_kind"] == "rss"


class TestAtom:
    def test_entries_link_preference_and_date_fallback(self, spark):
        rows = _entries(spark, ATOM)
        assert len(rows) == 2
        p1, p2 = rows
        # rel=alternate (or unmarked) wins over the enclosure link
        assert p1.link == "http://rb.example/p1"
        assert p1.published == "2026-08-10T00:00:00Z"  # updated fallback
        assert p1.summary == "Why light roasts taste brighter."
        assert p2.link == "http://rb.example/p2"
        assert p2.published == "2026-08-12T00:00:00Z"
        assert p1.feed_kind == "atom"

    def test_feed_metadata_alternate_site_link(self, spark):
        df = spark.createDataFrame([(ATOM,)], "body string")
        m = feed_metadata(df).collect()[0]["feed"]
        assert m["title"] == "Roast Blog"
        assert m["site_link"] == "http://rb.example/"  # not rel=self
        assert m["feed_kind"] == "atom"


WORDPRESS_RSS = """<?xml version="1.0"?>
<rss version="2.0" xmlns:atom="http://www.w3.org/2005/Atom"><channel>
<title>WP Site</title>
<atom:link href="https://x.example/feed/" rel="self" type="application/rss+xml" />
<link>https://x.example</link>
<item>
  <title>Post One</title>
  <atom:link href="https://x.example/p1-comments" rel="replies" />
  <link>https://x.example/p1</link>
  <pubDate>Mon, 10 Aug 2026 09:00:00 GMT</pubDate>
</item>
</channel></rss>"""


class TestSelfClosingAtomLink:
    """The near-universal WordPress `<atom:link rel="self" .../>`
    precedes the real `<link>`; a self-closing open must not capture
    into the next tag's content."""

    def test_channel_site_link_skips_self_closing(self, spark):
        df = spark.createDataFrame([(WORDPRESS_RSS,)], "body string")
        m = feed_metadata(df).collect()[0]["feed"]
        assert m["site_link"] == "https://x.example"
        assert m["title"] == "WP Site"

    def test_item_link_skips_self_closing(self, spark):
        rows = _entries(spark, WORDPRESS_RSS)
        assert len(rows) == 1
        assert rows[0].link == "https://x.example/p1"
        assert rows[0].title == "Post One"

    def test_slash_gt_inside_attribute_value_not_self_closing(self, spark):
        """Legal XML may carry '/>' INSIDE a quoted attribute value
        (`<link attr="a/>b">url</link>`); the quote-aware rejection
        must not mistake it for a self-closing tag and drop the entry
        (r12 advisor finding — the old lookahead returned zero rows)."""
        rss = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Q</title>
<link type="a/>b">https://q.example</link>
<item>
  <title attr='x/>y'>Tricky</title>
  <link data-note="see /> escaping">https://q.example/t1</link>
</item>
</channel></rss>"""
        rows = _entries(spark, rss)
        assert len(rows) == 1
        assert rows[0].link == "https://q.example/t1"
        assert rows[0].title == "Tricky"
        m = feed_metadata(
            spark.createDataFrame([(rss,)], "body string")
        ).collect()[0]["feed"]
        assert m["site_link"] == "https://q.example"

    def test_atom_link_attr_with_gt_not_truncated(self, spark):
        """Same quote-awareness for Atom <link> tag slicing: a '>'
        inside a quoted attribute must not truncate the tag, or the
        rel/href parsed from the truncated slice mis-read."""
        atom = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>T</title>
<entry>
  <title>E</title>
  <link rel="enclosure" href="http://x.example/skip.mp3"/>
  <link title="a > b" rel="alternate" href="http://x.example/e1"/>
</entry>
</feed>"""
        rows = _entries(spark, atom)
        assert len(rows) == 1
        assert rows[0].link == "http://x.example/e1"


def test_feeds_seed_the_frontier(spark):
    """Composition: feed entry links are build_frontier seeds — the
    same hookup sitemap_urls has."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
        build_frontier,
    )

    df = spark.createDataFrame([(RSS,)], "body string")
    seeds = feed_entries(df).select(F.col("link").alias("url"))
    crawled = spark.createDataFrame(
        [("http://cn.example/a2",)], "url string")
    frontier = build_frontier(
        spark.createDataFrame([], "url string, outlinks array<string>"),
        crawled=crawled,
        seeds=seeds,
    )
    got = {r.url for r in frontier.collect()}
    assert got == {"http://cn.example/a1"}  # a2 already crawled


def test_feed_seeds_recency_priority(spark):
    """feed_seeds: 0.5 ** (age/half_life) — exact at 0, 1 and 2
    half-lives, future timestamps clamp to 1.0, unparseable published
    is NULL priority (still a seed, sorts last)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.feeds import feed_seeds

    now = 1_755_000_000.0  # 2025-08-12T12:00:00Z
    hl = 86_400.0

    def iso(age_s):
        import datetime as dt
        return dt.datetime.fromtimestamp(
            now - age_s, dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")

    entries = spark.createDataFrame(
        [
            ("http://e/now", iso(0)),
            ("http://e/1hl", iso(hl)),
            ("http://e/2hl", iso(2 * hl)),
            ("http://e/future", iso(-3600)),
            ("http://e/undated", "not a date"),
        ],
        "link string, published string",
    )
    got = {
        r.url: r.priority
        for r in feed_seeds(entries, now_s=now, half_life_s=hl).collect()
    }
    assert got["http://e/now"] == 1.0
    assert abs(got["http://e/1hl"] - 0.5) < 1e-9
    assert abs(got["http://e/2hl"] - 0.25) < 1e-9
    assert got["http://e/future"] == 1.0  # clamp: skew is not signal
    assert got["http://e/undated"] is None


def test_feed_priority_rides_frontier_into_fetch_slots(spark):
    """The full freshness hookup: feed_seeds priority survives
    build_frontier's canonical-key dedup (MAX per key; outlink-only
    candidates NULL), steers the per-host cap, and orders
    schedule_fetches slots freshest-first within each host."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.feeds import feed_seeds
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
        build_frontier,
        schedule_fetches,
    )

    now = 1_755_000_000.0

    def iso(age_s):
        import datetime as dt
        return dt.datetime.fromtimestamp(
            now - age_s, dt.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")

    entries = spark.createDataFrame(
        [
            # h1: fresh beats stale beats undated; duplicate link
            # keeps its freshest reading through the per-key MAX
            ("http://h1.example/fresh", iso(3600)),
            ("http://h1.example/fresh", iso(11 * 86400)),
            ("http://h1.example/stale", iso(31 * 86400)),
            ("http://h1.example/undated", None),
        ],
        "link string, published string",
    )
    seeds = feed_seeds(entries, now_s=now)
    good = spark.createDataFrame(
        [("http://h0.example/", ["http://h1.example/outlink"])],
        "url string, outlinks array<string>",
    )
    frontier = build_frontier(good, seeds=seeds)
    pri = {r.url: r.priority for r in frontier.collect()}
    assert pri["http://h1.example/outlink"] is None
    assert pri["http://h1.example/undated"] is None
    assert pri["http://h1.example/fresh"] > pri["http://h1.example/stale"]
    # dup link kept the FRESH reading, not the stale one
    assert pri["http://h1.example/fresh"] > 0.9

    sched = {
        r.url: r.fetch_slot
        for r in schedule_fetches(
            frontier, priority_col="priority"
        ).collect()
    }
    assert sched["http://h1.example/fresh"] == 0
    assert sched["http://h1.example/stale"] == 1
    # undated + outlink queue behind every dated seed (NULLS LAST)
    assert {
        sched["http://h1.example/undated"],
        sched["http://h1.example/outlink"],
    } == {2, 3}

    # per-host cap keeps the freshest when it bites
    capped = build_frontier(good, seeds=seeds, max_per_host=2)
    kept = {r.url for r in capped.collect()}
    assert kept == {"http://h1.example/fresh", "http://h1.example/stale"}


# ---------------------------------------------------------------------------
# property: model → render → parse roundtrip (the fuzz-axis form: the
# expectation derives from the STRUCTURED model, never from parsing)

from hypothesis import HealthCheck, given, settings, strategies as st

_TEXT = st.text(alphabet="ab Zö9&<>'\"—", max_size=24)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )


def _norm(s):
    if s is None:
        return None
    return s.strip() or None


_rss_entry = st.fixed_dictionaries({
    "title": st.one_of(st.none(), _TEXT),
    "has_link": st.booleans(),
    "published": st.one_of(
        st.none(), st.just("Mon, 05 Jan 2026 08:00:00 GMT")
    ),
    "summary": st.one_of(st.none(), _TEXT),
    "cdata": st.booleans(),
    "noise": st.booleans(),  # self-closing atom:link before <link>
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_rss_entry, max_size=4), st.booleans())
def test_rss_model_roundtrip(spark, entries, channel_noise):
    parts = ['<?xml version="1.0"?><rss version="2.0"'
             ' xmlns:atom="http://www.w3.org/2005/Atom"><channel>'
             "<title>Chan</title>"]
    if channel_noise:
        parts.append('<atom:link href="http://x.example/feed"'
                     ' rel="self" />')
    parts.append("<link>http://x.example</link>")
    for i, e in enumerate(entries):
        parts.append("<item>")
        if e["noise"]:
            parts.append(f'<atom:link href="http://x.example/c{i}"'
                         ' rel="replies" />')
        if e["title"] is not None:
            parts.append(f"<title>{_esc(e['title'])}</title>")
        if e["has_link"]:
            parts.append(f"<link>http://x.example/{i}</link>")
        if e["published"] is not None:
            parts.append(f"<pubDate>{e['published']}</pubDate>")
        if e["summary"] is not None:
            # CDATA only when the content cannot form an entity or a
            # terminator (the parser unescapes after unwrap by design)
            if e["cdata"] and "&" not in e["summary"] \
                    and "]]>" not in e["summary"]:
                parts.append("<description><![CDATA["
                             f"{e['summary']}]]></description>")
            else:
                parts.append(
                    f"<description>{_esc(e['summary'])}</description>"
                )
        parts.append("</item>")
    parts.append("</channel></rss>")
    body = "".join(parts)

    df = spark.createDataFrame([(body,)], "body string")
    got = {r.link: r for r in feed_entries(df).collect()}
    want = {
        f"http://x.example/{i}": e
        for i, e in enumerate(entries) if e["has_link"]
    }
    assert set(got) == set(want)
    for link, e in want.items():
        r = got[link]
        assert r.feed_kind == "rss"
        assert r.title == _norm(e["title"]), (e, r)
        assert r.published == e["published"]
        assert r.summary == _norm(e["summary"]), (e, r)
    meta = feed_metadata(df).collect()[0]["feed"]
    assert meta["title"] == "Chan"
    assert meta["site_link"] == "http://x.example"


_atom_entry = st.fixed_dictionaries({
    "title": st.one_of(st.none(), _TEXT),
    "rels": st.lists(
        st.sampled_from(["alternate", "enclosure", "self", None]),
        max_size=3,
    ),
    "published": st.booleans(),
    "updated": st.booleans(),
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_atom_entry, max_size=3))
def test_atom_model_roundtrip(spark, entries):
    parts = ['<?xml version="1.0"?>'
             '<feed xmlns="http://www.w3.org/2005/Atom">'
             "<title>AChan</title>"
             '<link rel="alternate" href="http://a.example/"/>']
    for i, e in enumerate(entries):
        parts.append("<entry>")
        if e["title"] is not None:
            parts.append(f"<title>{_esc(e['title'])}</title>")
        for j, rel in enumerate(e["rels"]):
            rel_attr = f' rel="{rel}"' if rel is not None else ""
            parts.append(
                f'<link{rel_attr} href="http://a.example/{i}/{j}"/>'
            )
        if e["published"]:
            parts.append("<published>2026-01-0%d</published>" % (i + 1))
        if e["updated"]:
            parts.append("<updated>2026-02-0%d</updated>" % (i + 1))
        parts.append("</entry>")
    parts.append("</feed>")
    body = "".join(parts)

    df = spark.createDataFrame([(body,)], "body string")
    rows = feed_entries(df).collect()

    def want_link(i, e):
        # first alternate-or-unmarked link wins, else the first link
        for j, rel in enumerate(e["rels"]):
            if rel in (None, "alternate"):
                return f"http://a.example/{i}/{j}"
        return f"http://a.example/{i}/0" if e["rels"] else None

    want = {
        want_link(i, e): (i, e)
        for i, e in enumerate(entries) if want_link(i, e)
    }
    assert {r.link for r in rows} == set(want)
    for r in rows:
        i, e = want[r.link]
        assert r.feed_kind == "atom"
        assert r.title == _norm(e["title"])
        exp_pub = ("2026-01-0%d" % (i + 1)) if e["published"] else (
            ("2026-02-0%d" % (i + 1)) if e["updated"] else None
        )
        assert r.published == exp_pub, (e, r)


def test_feed_published_ts_rfc822_and_iso(spark):
    """Hand-derived instants: each input names its zone, so the
    expected UTC rendering is arithmetic, independent of session TZ."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.feeds import (
        feed_published_ts,
    )

    cases = [
        ("Mon, 05 Jan 2026 08:00:00 GMT", "2026-01-05 08:00:00"),
        ("Mon, 05 Jan 2026 08:00:00 +0200", "2026-01-05 06:00:00"),
        ("Mon, 5 Jan 2026 08:00:00 GMT", "2026-01-05 08:00:00"),
        ("05 Jan 2026 08:00:00 GMT", "2026-01-05 08:00:00"),  # no DOW
        ("2026-08-10T00:00:00Z", "2026-08-10 00:00:00"),      # Atom
        ("2026-08-10T05:30:00+05:30", "2026-08-10 00:00:00"),
        (" 2026-08-10T00:00:00Z ", "2026-08-10 00:00:00"),    # trim
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "p string")
    got = [
        r.u for r in df.select(
            F.date_format(feed_published_ts("p"), "yyyy-MM-dd HH:mm:ss")
            .alias("u")
        ).collect()
    ]
    assert got == [want for _, want in cases]
