"""robots.txt parsing + URL gating (RFC 9309, the Robots Exclusion
Protocol) — the crawl-policy front gate a responsible corpus builder
applies before fetching or keeping a page. Complements
`operators/html.py::robots_noindex` (the per-page meta gate): robots.txt
is the per-HOST policy, fetched once per origin.

Reference analog: none (ipynb ingests chat messages); north-star crawl
surface, same family as `sources/warc.py` and `operators/links.py`.

Shapes:

- :func:`parse_robots_txt`: (host, body) rows — one per origin, the
  way a crawler stores fetched policies — → (host, user_agent, allow,
  pattern, pattern_len, regex) RULE rows. Parsing is line-stateful
  (a rule belongs to the contiguous ``User-agent`` lines above it,
  RFC 9309 §2.1), so it runs as one Arrow ``mapInPandas`` stage — the
  decode doctrine: Python for byte-level/stateful parsing over a
  HOST-count-sized frame (orders of magnitude smaller than the page
  corpus), plain columns after.
- :func:`robots_gate`: pages × rules → ``allowed`` per URL. Per RFC
  9309 §2.2.2: the group is the most specific matching ``User-agent``
  (exact product token, else ``*``); among that group's rules the
  LONGEST-pattern match wins, allow wins length ties; no matching
  rule or no group → allowed. Wildcards ``*`` and the ``$`` anchor
  are compiled to anchored Java regexes at PARSE time (once per
  rule), so the gate itself is a host-keyed join + one HOF reduction
  per URL — no Python. At web scale the join shuffles on host; rules
  frames are origin-sized (small), so Spark's broadcast threshold
  usually turns it into a map-side gate.

Differential: wildcard-free behavior is pinned against stdlib
``urllib.robotparser`` on generated policies; wildcard/anchor behavior
is pinned against the RFC's own example table (robotparser predates
RFC 9309 and does plain prefix matching, so the wildcard rows are
spec-derived, not library-derived).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

RULES_DDL = (
    "host string, user_agent string, allow boolean, pattern string, "
    "pattern_len int, regex string"
)


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored Java regex: ``*`` matches any
    run (including ``/``), a TRAILING ``$`` anchors the end, every
    other byte is literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    return rx + "$" if anchored else rx


def _robots_lines(body: str):
    """The shared line/group state machine (RFC 9309 §2.1) both the
    rule and the directive parsers consume: yields ``(key, value,
    uas)`` for every non-comment key line, where ``uas`` is the
    CURRENT group's user-agent list (the contiguous ``User-agent``
    run directly above). One grammar, one implementation."""
    uas: list[str] = []
    collecting_uas = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not collecting_uas:
                uas = []  # a new group starts
                collecting_uas = True
            uas.append(value.lower())
            continue
        if key in ("allow", "disallow", "crawl-delay"):
            collecting_uas = False
        yield key, value, uas


def parse_robots_rules(body: str):
    """One robots.txt body → [(user_agent, allow, pattern)] rule
    tuples over the shared `_robots_lines` grammar; an EMPTY
    ``Disallow:`` or ``Allow:`` value becomes an empty-pattern allow
    rule (matches every path at specificity 0) so "this group exists"
    is representable — the group then shields its agent from ``*``;
    unknown keys (Sitemap, Crawl-delay, ...) are ignored here. Pure
    function, also usable driver-side in tests."""
    rules: list[tuple[str, bool, str]] = []
    for key, value, uas in _robots_lines(body):
        if key not in ("allow", "disallow") or not uas:
            continue  # rules before any user-agent line: ignored
        allow = key == "allow" or value == ""
        for ua in uas:
            rules.append((ua, allow, value))
    return rules


def parse_robots_directives(body: str):
    """The NON-rule lines a crawler also wants: ``(kind, user_agent,
    value)`` tuples — ``("crawl-delay", <ua>, seconds-string)`` per
    group (the de-facto politeness extension; RFC 9309 leaves it
    undefined but every major crawler honors it) and ``("sitemap",
    None, url)`` (group-independent per the sitemaps protocol).
    Same `_robots_lines` grammar as the rule parser."""
    out: list[tuple[str, str | None, str]] = []
    for key, value, uas in _robots_lines(body):
        if key == "crawl-delay":
            for ua in uas:
                out.append(("crawl-delay", ua, value))
        elif key == "sitemap":
            out.append(("sitemap", None, value))
    return out


def robots_directives(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, kind, user_agent, value) rows for crawl-delay and
    sitemap directives — the fetch scheduler's politeness input and
    the discovery seed for `sitemap_urls`. Same Arrow stage shape as
    `parse_robots_txt`."""
    import pandas as pd

    slim = df.select(
        F.col(host_col).alias("host"), F.col(body_col).alias("body")
    )

    def parse(batches):
        for batch in batches:
            out = []
            for host, body in zip(batch["host"], batch["body"]):
                for kind, ua, value in parse_robots_directives(body or ""):
                    out.append(
                        {"host": host, "kind": kind,
                         "user_agent": ua, "value": value}
                    )
            yield pd.DataFrame(
                out, columns=["host", "kind", "user_agent", "value"]
            )

    return slim.mapInPandas(
        parse, "host string, kind string, user_agent string, value string"
    )


def parse_robots_txt(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → RULE rows (module docstring). One Arrow stage
    over the origin-sized frame; regex compilation happens here, once
    per rule, so `robots_gate` stays pure-JVM."""
    import pandas as pd

    slim = df.select(
        F.col(host_col).alias("host"), F.col(body_col).alias("body")
    )

    def parse(batches):
        for batch in batches:
            out = []
            for host, body in zip(batch["host"], batch["body"]):
                for ua, allow, pattern in parse_robots_rules(body or ""):
                    out.append(
                        {
                            "host": host,
                            "user_agent": ua,
                            "allow": allow,
                            "pattern": pattern,
                            "pattern_len": len(pattern),
                            "regex": _pattern_to_regex(pattern),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[f.split(" ")[0] for f in RULES_DDL.split(", ")],
            )

    return slim.mapInPandas(parse, RULES_DDL)


def sitemap_urls(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Sitemap XML (sitemaps.org protocol) → one row per entry:
    ``kind`` ('url' for urlset entries, 'sitemap' for sitemapindex
    children — feed those back through a fetch + this parser),
    ``loc`` (XML-unescaped, CDATA unwrapped), ``lastmod`` (as
    written, NULL when absent). Pure JVM: block extraction via
    ``regexp_extract_all`` + per-block projections — the sitemap
    format is three tags deep, no XML library needed. Rows with an
    empty/missing ``<loc>`` are dropped (nothing to fetch)."""

    def blocks(tag: str):
        return F.regexp_extract_all(
            F.col(body_col),
            F.lit(rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>"),
            F.lit(0),
        )

    def loc_of(block: Column) -> Column:
        raw = F.regexp_extract(
            block, r"(?is)<loc[^>]*>\s*(.*?)\s*</loc", 1
        )
        unwrapped = F.when(
            raw.rlike(r"(?s)^<!\[CDATA\[.*\]\]>$"),
            F.regexp_extract(raw, r"(?s)^<!\[CDATA\[(.*)\]\]>$", 1),
        ).otherwise(raw)
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&apos;", "'"), ("&amp;", "&"),  # amp LAST: single unescape
        ):
            unwrapped = F.replace(unwrapped, F.lit(ent), F.lit(ch))
        return unwrapped

    def lastmod_of(block: Column) -> Column:
        return F.nullif(
            F.regexp_extract(
                block, r"(?is)<lastmod[^>]*>\s*(.*?)\s*</lastmod", 1
            ),
            F.lit(""),
        )

    def entries(tag: str, kind: str):
        keep = [c for c in df.columns if c != body_col]
        return df.select(
            *keep, F.explode(blocks(tag)).alias("__b")
        ).select(
            *keep,
            F.lit(kind).alias("kind"),
            loc_of(F.col("__b")).alias("loc"),
            lastmod_of(F.col("__b")).alias("lastmod"),
        )

    return (
        entries("url", "url")
        .unionByName(entries("sitemap", "sitemap"))
        .filter(F.col("loc") != "")
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    user_agent: str = "*",
    out_col: str = "allowed",
) -> DataFrame:
    """``urls`` + an ``allowed`` boolean per RFC 9309 §2.2.2 (module
    docstring). Hosts with no rules at all (no robots.txt fetched, or
    an empty one) are allowed — the spec's default."""
    ua = user_agent.lower()
    host = F.lower(
        F.try_parse_url(F.col(url_col), F.lit("HOST"))
    )
    path = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # RFC 9309 matches against path AND query ('Disallow: /search?q='
    # is a common real-world pattern; '$'-anchored rules must see the
    # query too) — robotparser agrees
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    path = F.when(
        query.isNotNull(), F.concat(path, F.lit("?"), query)
    ).otherwise(path)

    # group selection per host: the specific-UA group if one exists,
    # else the * group (RFC: exactly one group applies)
    r = rules.select(
        F.col("host").alias("__rhost"),
        "user_agent", "allow", "pattern_len", "regex",
    )
    specific_hosts = (
        r.filter(F.col("user_agent") == ua)
        .select("__rhost")
        .distinct()
    )
    chosen = r.filter(F.col("user_agent") == ua).unionByName(
        r.filter(F.col("user_agent") == "*").join(
            specific_hosts, "__rhost", "left_anti"
        )
    ) if ua != "*" else r.filter(F.col("user_agent") == "*")

    # one row per (host): the rule list packed into an array so the
    # per-URL reduction is a HOF, not a per-rule join explosion
    packed = chosen.groupBy("__rhost").agg(
        F.collect_list(
            F.struct("allow", "pattern_len", "regex")
        ).alias("__rules")
    )

    joined = urls.withColumn("__host", host).withColumn("__path", path).join(
        packed, F.col("__host") == F.col("__rhost"), "left"
    )
    p = F.col("__path")
    matching = F.filter(
        F.coalesce(
            F.col("__rules"),
            F.expr(
                "cast(array() as array<struct<allow:boolean,"
                "pattern_len:int,regex:string>>)"
            ),
        ),
        lambda rl: F.regexp_like(p, rl["regex"]),
    )
    # longest pattern wins; allow wins ties → reduce by (len, allow)
    best = F.aggregate(
        matching,
        F.lit(None).cast(
            "struct<allow:boolean,pattern_len:int,regex:string>"
        ),
        lambda acc, rl: F.when(acc.isNull(), rl).when(
            (rl["pattern_len"] > acc["pattern_len"])
            | (
                (rl["pattern_len"] == acc["pattern_len"])
                & rl["allow"]
                & ~acc["allow"]
            ),
            rl,
        ).otherwise(acc),
    )
    return joined.withColumn(
        out_col, F.coalesce(best["allow"], F.lit(True))
    ).drop("__host", "__path", "__rhost", "__rules")
