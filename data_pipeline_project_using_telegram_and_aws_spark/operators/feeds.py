"""RSS 2.0 / Atom feed parsing — the other standard crawl-seed
format beside sitemaps (north-star crawl-surface extension; feeds
carry what sitemaps don't: per-entry titles, summaries, and
publication dates, i.e. fetch-priority signals).

Same doctrine as `operators/robots.py sitemap_urls`: the formats are
a fixed three tags deep, so block extraction via
``regexp_extract_all`` + per-block projections covers them with NO
XML library and NO Python stage. Contract, stated:

- :func:`feed_entries` — one row per ``<item>`` (RSS) or ``<entry>``
  (Atom): ``feed_kind`` (rss|atom), ``title``, ``link`` (RSS
  ``<link>text</link>``; Atom ``<link href=..>`` preferring
  ``rel="alternate"`` or unmarked over others), ``published`` (RSS
  ``pubDate`` / Atom ``published`` falling back to ``updated``, as
  written), ``summary`` (RSS ``description`` / Atom ``summary``,
  entity-unescaped, CDATA unwrapped — it may contain HTML; route it
  through `operators/html.py html_to_text` for visible text).
  Entries missing a link are dropped (nothing to fetch).
- :func:`feed_metadata` — channel/feed-level struct(title,
  site_link, feed_kind); the channel title is the first ``<title>``
  BEFORE any entry block (so entry titles never shadow it).

Namespaced variants (``<atom:entry>``, ``<content:encoded>``) are
matched by localname, the `operators/office.py` tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "feed_entries",
    "feed_metadata",
    "feed_published_ts",
    "feed_seeds",
]


def _unescape(raw: Column) -> Column:
    unwrapped = F.when(
        raw.rlike(r"(?s)^\s*<!\[CDATA\[.*\]\]>\s*$"),
        F.regexp_extract(raw, r"(?s)^\s*<!\[CDATA\[(.*)\]\]>\s*$", 1),
    ).otherwise(raw)
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),  # amp LAST: single unescape
    ):
        unwrapped = F.replace(unwrapped, F.lit(ent), F.lit(ch))
    return F.nullif(F.trim(unwrapped), F.lit(""))


def _tag_text(block: Column, tag: str) -> Column:
    # (?:\w+:)? — namespace-prefixed variants match by localname.
    # _ATTRS consumes the attribute region quote-aware (a quoted value
    # is one unit, so `>` or `/>` INSIDE an attribute value — legal
    # XML like `<link attr="a/>b">url</link>` — neither terminates the
    # open tag nor trips the self-closing rejection; the alternatives
    # are first-char-disjoint, so no backtracking blowup).
    # (?!_ATTRS/>) — a self-closing open (`<atom:link rel="self"/>`,
    # near-universal in WordPress RSS ahead of the real `<link>`) has
    # no text content; without the rejection the lazy capture would
    # span from it into the NEXT tag's content.  \b + `\s*>` on the
    # close keep `<linkage>`/`</linkage>` from matching tag `link`.
    attrs = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"
    return _unescape(F.regexp_extract(
        block,
        rf"(?is)<(?:\w+:)?{tag}\b(?!{attrs}/>){attrs}>"
        rf"\s*(.*?)\s*</(?:\w+:)?{tag}\s*>",
        1,
    ))


def _atom_link(block: Column) -> Column:
    # quote-aware attr consumption (the _tag_text pattern): a '>'
    # inside a quoted attribute value must not truncate the tag
    # slice, or rel/href parsed from the truncated slice mis-read
    links = F.regexp_extract_all(
        block,
        F.lit(r"(?is)<(?:\w+:)?link\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*/?>"),
        F.lit(0),
    )

    def href(tag: Column) -> Column:
        return F.nullif(F.coalesce(
            F.regexp_extract(tag, r'(?i)href\s*=\s*"([^"]*)"', 1),
            F.regexp_extract(tag, r"(?i)href\s*=\s*'([^']*)'", 1),
        ), F.lit(""))

    def rel(tag: Column) -> Column:
        return F.lower(F.coalesce(F.nullif(F.coalesce(
            F.regexp_extract(tag, r'(?i)\brel\s*=\s*"([^"]*)"', 1),
            F.regexp_extract(tag, r"(?i)\brel\s*=\s*'([^']*)'", 1),
        ), F.lit("")), F.lit("alternate")))

    preferred = F.filter(links, lambda t: rel(t) == "alternate")
    pick = F.coalesce(F.try_element_at(preferred, F.lit(1)),
                      F.try_element_at(links, F.lit(1)))
    return href(pick)


def feed_entries(df: DataFrame, body_col: str = "body") -> DataFrame:
    """One row per feed entry (module contract); input columns other
    than ``body_col`` pass through (carry the fetch URL along)."""
    keep = [c for c in df.columns if c != body_col]

    def blocks(tag: str):
        return F.regexp_extract_all(
            F.col(body_col),
            F.lit(rf"(?is)<(?:\w+:)?{tag}\b[^>]*>.*?</(?:\w+:)?{tag}\s*>"),
            F.lit(0),
        )

    b = F.col("__b")
    rss = df.select(*keep, F.explode(blocks("item")).alias("__b")).select(
        *keep,
        F.lit("rss").alias("feed_kind"),
        _tag_text(b, "title").alias("title"),
        _tag_text(b, "link").alias("link"),
        _tag_text(b, "pubDate").alias("published"),
        _tag_text(b, "description").alias("summary"),
    )
    atom = df.select(*keep, F.explode(blocks("entry")).alias("__b")).select(
        *keep,
        F.lit("atom").alias("feed_kind"),
        _tag_text(b, "title").alias("title"),
        _atom_link(b).alias("link"),
        F.coalesce(
            _tag_text(b, "published"), _tag_text(b, "updated")
        ).alias("published"),
        _tag_text(b, "summary").alias("summary"),
    )
    return rss.unionByName(atom).filter(F.col("link").isNotNull())


def feed_published_ts(published: Column | str) -> Column:
    """The ``published`` string as a TIMESTAMP instant — RSS writes
    RFC 822 (`Mon, 05 Jan 2026 08:00:00 GMT` / `+0200`, day-of-week
    optional per the grammar), Atom writes ISO 8601; both zone forms
    resolve to absolute instants. Unparseable/absent input is NULL
    (absence is data). Opt-in column helper: `feed_entries` keeps the
    as-written string (the raw-zone contract); recency priors /
    recrawl scheduling parse it with this. Two-digit RFC 822 years
    (obsolete since RFC 1123) are deliberately not handled. All
    JVM-side ``try_to_timestamp`` — no Python, no exceptions."""
    c = F.col(published) if isinstance(published, str) else published
    c = F.trim(c)
    # Spark's parser rejects day-of-week letters outright (the
    # cross-version E restriction), and RFC 822 makes the DOW
    # optional anyway — strip it, then parse day-first with either
    # zone form. 'd' accepts both 1- and 2-digit days.
    rfc = F.regexp_replace(c, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(c),  # ISO 8601 via the default parser
        F.try_to_timestamp(rfc, F.lit("d MMM yyyy HH:mm:ss zzz")),
        F.try_to_timestamp(rfc, F.lit("d MMM yyyy HH:mm:ss XX")),
    )


def feed_seeds(
    entries: DataFrame,
    now_s: float,
    half_life_s: float = 7 * 86400.0,
) -> DataFrame:
    """`feed_entries` rows → frontier seeds ``(url, priority)`` with a
    publish-recency priority: ``0.5 ** (age / half_life_s)`` in
    (0, 1] — an entry published ``half_life_s`` ago scores half a
    just-published one (the freshness dial; default one week). Future
    timestamps clamp to age 0 (clock skew is not a ranking signal),
    unparseable/absent ``published`` yields NULL priority — such
    seeds still enter the frontier but sort AFTER every dated one in
    `links.schedule_fetches(priority_col=...)` and
    `links.build_frontier(max_per_host=...)`'s cap (both order
    NULLS LAST). ``now_s`` is the caller's clock (epoch seconds),
    passed in — the `recrawl.schedule_revisits` determinism contract.
    All JVM-side column math; duplicate links across feeds collapse
    to their freshest reading in `build_frontier`'s per-key MAX."""
    ts = F.unix_timestamp(
        feed_published_ts(F.col("published"))
    ).cast("double")
    age = F.greatest(F.lit(float(now_s)) - ts, F.lit(0.0))
    # greatest() SKIPS nulls (an undated entry would read age 0 →
    # priority 1.0); the isNotNull guard keeps absence as NULL
    pri = F.when(
        ts.isNotNull(),
        F.pow(F.lit(0.5), age / F.lit(float(half_life_s))),
    )
    return entries.select(
        F.col("link").alias("url"),
        F.round(pri, 9).alias("priority"),
    )


def feed_metadata(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Adds struct ``feed(title, site_link, feed_kind)`` — the
    channel-level identity (module contract)."""
    body = F.col(body_col)
    # head = everything before the first entry block, so entry
    # titles never shadow the channel title
    head = F.regexp_replace(
        body, r"(?is)<(?:\w+:)?(?:item|entry)\b.*$", ""
    )
    is_atom = body.rlike(r"(?is)<(?:\w+:)?feed\b")
    kind = F.when(is_atom, F.lit("atom")).otherwise(
        F.when(body.rlike(r"(?is)<(?:\w+:)?rss\b"), F.lit("rss"))
    )
    site = F.when(is_atom, _atom_link(head)).otherwise(
        _tag_text(head, "link")
    )
    return df.withColumn(
        "feed",
        F.struct(
            _tag_text(head, "title").alias("title"),
            site.alias("site_link"),
            kind.alias("feed_kind"),
        ),
    )
