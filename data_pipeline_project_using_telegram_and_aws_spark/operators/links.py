"""Outlink extraction + link graph + PageRank — the crawl surface's
graph side. `sources/warc.py` + `operators/html.py` turn archives into
text; this module turns the same pages into EDGES, the input for
frontier discovery, domain-authority quality signals, and the
link-graph workloads `connected_components(algorithm="star")` exists
for.

Reference analog: none (the reference ingests chat messages, ipynb
cell 21); this is north-star extension surface for a web-scale
pretraining pipeline.

Spark-first, zero Python end-to-end:

- :func:`extract_links`: every ``<a ...>text</a>`` via
  ``regexp_extract_all`` + explode → one row per anchor with its
  href (fragment-stripped), visible anchor text, and a ``nofollow``
  flag (rel attribute, order/quoting-insensitive via the shared
  `html._attr_value`). Non-navigational schemes (javascript:,
  mailto:, tel:, data:) and fragment-only hrefs are dropped.
- :func:`resolve_url`: RFC 3986 §5 relative resolution as pure
  column expressions — absolute / protocol-relative / root-relative /
  path-relative (+ ``.``/``..`` dot-segment removal via
  ``F.aggregate`` over the segment array). Differentially tested
  against stdlib ``urllib.parse.urljoin`` on generated cases.
- :func:`link_graph`: (src, dst) edges normalized to canonical dedup
  keys (`urls.normalize_url`), self-loops dropped, distinct. One
  explode + one distinct — no joins.
- :func:`pagerank`: classic damped power iteration, the
  components-loop shape: per round one join on src + one groupBy on
  dst (both node-keyed shuffles), dangling mass redistributed
  uniformly as an in-plan broadcast scalar, lazy ``localCheckpoint``
  per round, L1-delta convergence collected every ``check_every``
  rounds (one driver action per segment — round-trip cost amortized).
  Rounds are O(log(1/tol)/log(1/d)) — independent of graph size; the
  per-round cost is edge-linear. At 100 TB the edge list shards by
  dst like any keyed aggregation.
- :func:`hits`: Kleinberg hubs/authorities, the same amortized-action
  loop shape as `pagerank` (two edge-keyed shuffles per round, in-plan
  broadcast normalizers, convergence collected every ``check_every``
  rounds).
- :func:`schedule_fetches`: the politeness bridge from
  `build_frontier` to a fetch executor — per-host crawl-delay (from
  `robots.robots_directives`) × deterministic fetch slots → a planned
  start offset per URL. One window + one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .html import _attr_value
from .urls import normalize_url

# schemes a link graph must not follow
_NON_NAV = ("javascript:", "mailto:", "tel:", "data:", "about:")
_NON_NAV_RE = "^(" + "|".join(s.rstrip(":") for s in _NON_NAV) + "):"
_ANCHOR_RE = r"(?is)<a\b[^>]*>.*?</a\s*>"


def _strip_fragment(href: Column) -> Column:
    return F.element_at(F.split(href, "#", 2), 1)


def _anchor_parts(a: Column):
    """(tag, href, nofollow, navigable) from one matched ``<a>…</a>``
    block — the ONE implementation of the per-anchor predicate both
    `extract_links` (exploded form) and `outlink_array` (array form)
    share, so the two can never drift."""
    tag = F.regexp_extract(a, r"(?s)^(<[^>]*>)", 1)
    href = _strip_fragment(
        F.coalesce(_attr_value(tag, "href"), F.lit(""))
    )
    rel = F.lower(F.coalesce(_attr_value(tag, "rel"), F.lit("")))
    nofollow = rel.rlike(r"(^|[\s])nofollow([\s]|$)")
    nav = (href != "") & ~F.lower(href).rlike(_NON_NAV_RE)
    return tag, href, nofollow, nav


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over a slash-split array: ``..`` pops, ``.``
    and empty segments vanish, everything else appends — one
    ``F.aggregate`` fold, no Python. A trailing ``/`` (or trailing
    ``/.`` / ``/..``) is re-appended per the spec's output shape."""
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: (
            F.when(
                s == "..",
                F.slice(
                    acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))
                ),
            )
            .when((s == ".") | (s == ""), acc)
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    joined = F.concat(F.lit("/"), F.array_join(folded, "/"))
    trailing = (
        F.endswith(path, F.lit("/"))
        | F.endswith(path, F.lit("/."))
        | F.endswith(path, F.lit("/.."))
    )
    return F.when(
        trailing & ~F.endswith(joined, F.lit("/")),
        F.concat(joined, F.lit("/")),
    ).otherwise(joined)


def resolve_url(base: Column, href: Column) -> Column:
    """Resolve ``href`` against ``base`` (an absolute http(s) URL) per
    RFC 3986 §5 — the subset a crawler meets: absolute, protocol-
    relative (``//host/x``), root-relative (``/x``), query-only
    (``?q``), and path-relative (incl. ``.``/``..``) references.
    NULL when the base does not parse. Fragments are expected to be
    stripped by the caller (`extract_links` does)."""
    scheme = F.lower(F.element_at(F.split(base, "://", 2), 1))
    # authority INCLUDING port — resolution must preserve the fetch
    # address exactly (normalize_url's port-dropping is a dedup-key
    # decision, applied later by link_graph, not here)
    after = F.coalesce(
        F.try_element_at(F.split(base, "://", 2), F.lit(2)), F.lit("")
    )
    authority = F.element_at(F.split(after, "/", 2), 1)
    authority = F.element_at(F.split(authority, r"\?", 2), 1)
    origin = F.concat(scheme, F.lit("://"), authority)
    rest = F.substring(
        after, F.length(authority) + F.lit(1), F.lit(1 << 30)
    )
    base_path = F.element_at(F.split(rest, r"\?", 2), 1)
    base_path = F.when(base_path == "", F.lit("/")).otherwise(base_path)
    # the reference's directory: base path up to and incl. last '/'
    base_dir = F.regexp_extract(base_path, r"^(.*/)", 1)
    is_abs = href.rlike(r"(?i)^[a-z][a-z0-9+.-]*://")
    # dot-segment removal runs on the PATH only: split the reference's
    # query off first, re-append it after (".." followed by "?q" must
    # still pop a segment)
    href_path = F.element_at(F.split(href, r"\?", 2), 1)
    href_query = F.try_element_at(F.split(href, r"\?", 2), F.lit(2))
    q = F.when(
        href_query.isNotNull(), F.concat(F.lit("?"), href_query)
    ).otherwise(F.lit(""))
    resolved = (
        F.when(is_abs, href)
        .when(
            F.startswith(href, F.lit("//")),
            F.concat(scheme, F.lit(":"), href),
        )
        .when(
            F.startswith(href, F.lit("?")),
            F.concat(origin, base_path, href),
        )
        .when(
            F.startswith(href, F.lit("/")),
            F.concat(origin, _remove_dot_segments(href_path), q),
        )
        .when(
            href == "",
            F.concat(origin, base_path),
        )
        .otherwise(
            F.concat(
                origin,
                _remove_dot_segments(F.concat(base_dir, href_path)),
                q,
            )
        )
    )
    return F.when(
        scheme.isNull() | (authority == "") | base.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(resolved)


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per ``<a>`` anchor: the input columns minus the html,
    plus ``href`` (resolved absolute URL, fragment stripped),
    ``anchor_text`` (visible text, whitespace-collapsed, NULL when
    empty), and ``nofollow``. Non-navigational and fragment-only
    hrefs are dropped before the explode. Pure projections + one
    explode — per-row work linear in document size, no shuffle."""
    anchors = F.regexp_extract_all(
        F.col(html_col), F.lit(_ANCHOR_RE), F.lit(0)
    )
    out = df.select(
        *[c for c in df.columns if c != html_col],
        F.explode(anchors).alias("__a"),
    )
    _, raw_href, nofollow, nav = _anchor_parts(F.col("__a"))
    inner = F.regexp_replace(F.col("__a"), r"(?s)^<[^>]*>|</a\s*>$", "")
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(inner, r"(?s)<[^>]*>", " "), r"\s+", " "
        )
    )
    return (
        out.filter(nav)
        .select(
            *[c for c in out.columns if c != "__a"],
            resolve_url(F.col(url_col), raw_href).alias("href"),
            F.nullif(text, F.lit("")).alias("anchor_text"),
            nofollow.alias("nofollow"),
        )
        .filter(F.col("href").isNotNull())
    )


def outlink_array(html_col, url_col) -> Column:
    """The follow-able outlinks of a page as ONE array column —
    `extract_links`' semantics (fragment strip, non-navigational
    schemes dropped, nofollow dropped, resolution against the page
    URL) without the explode, for sinks that keep one row per page
    (the crawl front door's good zone: the next crawl round's
    frontier and the link graph, without re-reading the raw HTML).
    Entirely HOFs over the anchor array — no explode, no shuffle."""
    html = F.col(html_col) if isinstance(html_col, str) else html_col
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    anchors = F.regexp_extract_all(html, F.lit(_ANCHOR_RE), F.lit(0))

    def to_href(a: Column) -> Column:
        _, href, nofollow, nav = _anchor_parts(a)
        return F.when(nav & ~nofollow, resolve_url(url, href))

    return F.array_distinct(
        F.filter(
            F.transform(anchors, to_href), lambda h: h.isNotNull()
        )
    )


def link_graph(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    follow_only: bool = True,
    granularity: str = "url",
    links: DataFrame | None = None,
) -> DataFrame:
    """Distinct (src, dst) edges from pages — `extract_links` +
    endpoint keying, self-loops dropped. ``follow_only`` honors
    nofollow (the responsible default for authority computation).
    ``granularity``: ``"url"`` keys endpoints by `urls.normalize_url`
    (the page graph); ``"host"`` by `urls.url_host`; ``"domain"`` by
    `urls.registered_domain` — the host/domain contractions are what
    corpus-quality work actually consumes (domain authority as a
    filter feature), and they shrink the edge set by orders of
    magnitude before any iteration runs on it. Pass ``links`` (an
    `extract_links` result carrying ``url_col``/``href``/``nofollow``)
    to key an already-extracted anchor set instead of re-running the
    extraction — callers that also build an anchor index or frontier
    from the same pages should extract ONCE and share it."""
    from .urls import registered_domain, url_host

    if granularity == "url":
        key = normalize_url
    elif granularity == "host":
        key = url_host
    elif granularity == "domain":
        key = registered_domain
    else:
        raise ValueError(
            f"link_graph: granularity must be url | host | domain, "
            f"got {granularity!r}"
        )
    if links is None:
        links = extract_links(df, html_col=html_col, url_col=url_col)
    if follow_only:
        links = links.filter(~F.col("nofollow"))
    return (
        links.select(
            key(F.col(url_col)).alias("src"),
            key(F.col("href")).alias("dst"),
        )
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )


def anchor_text_index(
    links: DataFrame,
    dst_col: str = "href",
    text_col: str = "anchor_text",
    k: int = 5,
) -> DataFrame:
    """Incoming anchor texts per target page — the classic off-page
    relevance signal (what OTHER pages call this one), and a strong
    quality feature for corpus filtering. Input: `extract_links`
    rows. Output: (url, anchor_texts array<struct<text,n>>, n_inlinks)
    with the top-``k`` distinct texts by frequency, ties broken
    lexicographically for determinism. Two keyed aggregations; the
    per-target array is k-bounded."""
    from pyspark.sql.window import Window

    counted = (
        links.filter(F.col(text_col).isNotNull())
        .groupBy(
            F.col(dst_col).alias("url"),
            F.lower(F.col(text_col)).alias("text"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rn = F.row_number().over(
        Window.partitionBy("url").orderBy(F.desc("n"), F.asc("text"))
    )
    topk = (
        counted.withColumn("__rn", rn)
        .filter(F.col("__rn") <= k)
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__rn", "text", "n"))
            ).alias("__s")
        )
    )
    # inlink counts drive (LEFT side): a target whose every inlink is
    # textless still gets its row, with an empty anchor_texts array
    return (
        links.groupBy(F.col(dst_col).alias("url"))
        .agg(F.count(F.lit(1)).alias("n_inlinks"))
        .join(topk, "url", "left")
        .select(
            "url",
            F.transform(
                F.coalesce("__s", F.expr(
                    "cast(array() as "
                    "array<struct<__rn:int,text:string,n:bigint>>)"
                )),
                lambda s: F.struct(s["text"], s["n"]),
            ).alias("anchor_texts"),
            "n_inlinks",
        )
    )


def build_frontier(
    good: DataFrame,
    rules: DataFrame | None = None,
    crawled: DataFrame | None = None,
    outlinks_col: str = "outlinks",
    crawled_url_col: str = "url",
    user_agent: str = "*",
    max_per_host: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """The next crawl round's fetch list from the good zone's
    ``outlinks`` arrays (the `streaming/crawl_ingest.py` output):
    explode → distinct candidate URLs → minus the already-crawled set
    (anti-join on the canonical dedup key, so tracking-param variants
    don't re-enter) → robots-gated (`operators/robots.py`, when rules
    are given) → optionally capped per host in deterministic md5
    order (the politeness bound a fetch scheduler wants). One
    explode + one anti-join + one host-keyed window when capped —
    every step keyed, nothing all-pairs.

    ``seeds`` (optional): extra candidate URLs unioned in BEFORE the
    canonical-key dedup — the `sitemap_urls` hookup (robots
    `robots_directives` sitemap rows → fetched sitemaps → seed URLs)
    and the operator's entry point for hand-curated seed lists; they
    ride the same crawled-set anti-join and robots gate as
    discovered outlinks. Seeds MAY carry a ``priority`` double (the
    `feeds.feed_seeds` publish-recency score); when they do, the
    frontier keeps the MAX priority per canonical key (outlink-only
    candidates get NULL), the per-host cap keeps the
    highest-priority URLs first (NULLS LAST, md5 tiebreak), and the
    column rides out for `schedule_fetches(priority_col=...)`."""
    from pyspark.sql.window import Window

    from .robots import robots_gate

    cand = good.select(F.explode(F.col(outlinks_col)).alias("url"))
    has_priority = seeds is not None and "priority" in seeds.columns
    if has_priority:
        cand = cand.withColumn(
            "priority", F.lit(None).cast("double")
        ).unionByName(
            seeds.select("url", F.col("priority").cast("double"))
        )
    elif seeds is not None:
        cand = cand.unionByName(seeds.select(F.col("url")))
    pri_agg = [F.max("priority").alias("priority")] if has_priority else []
    cand = (
        cand
        .withColumn("__key", normalize_url("url"))
        .filter(F.col("__key").isNotNull())
        # ONE candidate per canonical key (not per raw string):
        # variants of the same page collapse here, deterministically
        .groupBy("__key")
        .agg(F.min("url").alias("url"), *pri_agg)
    )
    if crawled is not None:
        seen = crawled.select(
            normalize_url(F.col(crawled_url_col)).alias("__key")
        ).distinct()
        cand = cand.join(seen, "__key", "left_anti")
    if rules is not None:
        cand = robots_gate(cand, rules, user_agent=user_agent).filter(
            F.col("allowed")
        ).drop("allowed")
    if max_per_host is not None:
        host = F.lower(F.try_parse_url(F.col("url"), F.lit("HOST")))
        cap_order = (
            [F.desc_nulls_last("priority"), F.md5("url")]
            if has_priority else [F.md5("url")]
        )
        rn = F.row_number().over(
            Window.partitionBy(host).orderBy(*cap_order)
        )
        cand = cand.withColumn("__rn", rn).filter(
            F.col("__rn") <= max_per_host
        ).drop("__rn")
    return cand.drop("__key")


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iters: int = 100,
    tol: float = 1e-6,
    check_every: int = 4,
    init: DataFrame | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) with Σrank = 1 over the DIRECTED edge set —
    damped power iteration with uniform dangling-mass redistribution
    (module docstring scale notes). Converges when the per-round L1
    rank delta drops under ``tol`` — geometric at rate ``damping``, so
    the default budget covers log(tol)/log(damping) ≈ 85 rounds at
    0.85; raises if ``max_iters`` rounds don't get there (a silent
    non-converged ranking would skew every consumer).

    Driver round trips are the fixed per-round cost that dominates
    small and mid-size graphs (BENCH_NOTES graph probe), so the loop
    runs ZERO actions per round: the dangling mass rides the plan as a
    broadcast 1-row aggregate (the repo's scalar-cross-join pattern)
    instead of a per-round ``collect``, rounds are lazily
    checkpointed, and the per-round L1 delta (same criterion as ever
    — last round vs the one before it) is collected only every
    ``check_every`` rounds. One action per ``check_every`` rounds; a
    convergence hit between checks costs at most ``check_every - 1``
    extra cheap rounds.

    ``init`` (optional): a previous (node, rank) result to WARM-START
    from — the crawl loop's shape, where each round adds a few edges
    to a big graph and the old ranks are already near the new fixed
    point, so convergence needs a handful of rounds instead of the
    full log(tol)/log(d) budget. New nodes (absent from ``init``)
    enter at 1/n; the seed is L1-renormalized over the CURRENT node
    set, so stale extra nodes in ``init`` are ignored and Σrank = 1
    holds from round one.

    ``personalization`` (optional): a (node, weight) frame making this
    PERSONALIZED PageRank — teleport probability and dangling mass
    both flow to the weighted nodes instead of uniformly (weights are
    L1-normalized over the matched graph nodes; unmatched graph nodes
    teleport-weight 0). The seed-focused authority signal
    topic-targeted crawling ranks its frontier with. Raises if no
    weight lands on any graph node (the teleport target would be
    empty)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    if personalization is None:
        pnodes = nodes.withColumn("__p", F.lit(1.0 / n))
    else:
        w = personalization.select(
            F.col("node"), F.col("weight").cast("double").alias("__w")
        )
        matched = nodes.join(w, "node", "left").select(
            "node", F.coalesce("__w", F.lit(0.0)).alias("__w")
        )
        z = matched.agg(F.sum("__w")).collect()[0][0]
        if not z or z <= 0:
            raise ValueError(
                "pagerank: personalization weights match no graph "
                "node (teleport target empty)"
            )
        pnodes = matched.select(
            "node", (F.col("__w") / F.lit(float(z))).alias("__p")
        )
    pnodes = pnodes.localCheckpoint(eager=False)
    if init is None:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    else:
        seeded = nodes.join(
            init.select("node", F.col("rank").alias("__seed")),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce("__seed", F.lit(1.0 / n)).alias("rank"),
        )
        total = seeded.agg(
            F.coalesce(F.sum("rank"), F.lit(1.0)).alias("__z")
        )
        ranks = seeded.crossJoin(F.broadcast(total)).select(
            "node", (F.col("rank") / F.col("__z")).alias("rank")
        )
    ranks = ranks.localCheckpoint(eager=False)

    def one_round(cur: DataFrame) -> DataFrame:
        with_deg = cur.join(
            deg, cur["node"] == deg["src"], "left"
        ).select("node", "rank", "__deg")
        # dangling nodes (no out-edges) donate their whole rank to the
        # uniform pool — a 1-row aggregate broadcast into the update
        # (no driver action)
        dangling = with_deg.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("__deg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("__deg")).alias("__share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        return (
            pnodes
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("__p")
                    + F.lit(damping) * F.col("__dangling") * F.col("__p")
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
        )

    done = 0
    delta = None  # None = convergence never measured (max_iters < 1)
    while done < max_iters:
        steps = min(check_every, max_iters - done)
        prev = ranks
        for _ in range(steps):
            prev = ranks
            ranks = one_round(ranks).localCheckpoint(eager=False)
        done += steps
        delta = (
            ranks.join(
                prev.select("node", F.col("rank").alias("__prev")), "node"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))))
            .collect()[0][0]
        )
        if delta is not None and delta < tol:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge in {max_iters} rounds (last L1 "
        f"delta {'unmeasured' if delta is None else f'{delta:.2e}'} "
        f">= tol {tol:.0e})"
    )


def schedule_fetches(
    frontier: DataFrame,
    directives: DataFrame | None = None,
    url_col: str = "url",
    user_agent: str = "*",
    default_delay: float = 1.0,
    max_delay: float = 30.0,
    priority_col: str | None = None,
) -> DataFrame:
    """Politeness schedule for a fetch round: each frontier URL gets
    its host's crawl-delay (from `robots.robots_directives` rows,
    specific user-agent beating ``*``; parse failures and
    non-positive values fall back to ``default_delay``, oversized
    ones cap at ``max_delay``), a
    deterministic per-host ``fetch_slot`` (md5 order — the same dice
    `build_frontier`'s cap uses), and ``planned_offset_s = slot ×
    delay``: the earliest start time relative to the round's t0 that
    honors the host's delay. A fetch executor can sort by
    ``planned_offset_s`` and stream the round out without ever
    hitting one host faster than its policy allows.

    ``priority_col`` (optional): a double column on ``frontier``
    (the `feeds.feed_seeds` publish-recency score ridden through
    `build_frontier`); when given, each host's slots go to its
    highest-priority URLs first (NULLS LAST — undated seeds and
    plain outlinks queue behind every dated one), md5 as the
    deterministic tiebreak. Fresh feed entries therefore fetch
    EARLIEST within their host's politeness budget.

    Plan shape: one host-keyed window + one broadcast-sized join on
    the per-host delay table (origin-sized, like every robots frame).
    No Python."""
    from pyspark.sql.window import Window

    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    out = frontier.withColumn("host", host)
    if directives is not None:
        ua = F.lower(F.col("user_agent"))
        # only rows addressed to THIS agent or to '*' apply — a
        # generic crawler must not adopt another bot's delay
        cand = (
            directives.filter(F.col("kind") == "crawl-delay")
            .filter(ua.isin(user_agent.lower(), "*"))
            .select(
                "host",
                # specific-UA rows beat '*' rows: rank and keep min
                F.when(ua == user_agent.lower(), F.lit(0))
                .otherwise(F.lit(1))
                .alias("__pref"),
                F.col("value").try_cast("double").alias("__delay"),
            )
            # non-positive delays are malformed like unparseable ones:
            # both fall back to default_delay (docstring: the usable
            # range is (0, max_delay])
            .filter(
                F.col("__delay").isNotNull() & (F.col("__delay") > 0)
            )
        )
        best = F.row_number().over(
            Window.partitionBy("host").orderBy("__pref", "__delay")
        )
        delays = (
            cand.withColumn("__rn", best)
            .filter(F.col("__rn") == 1)
            .select(
                "host",
                F.least(F.col("__delay"), F.lit(max_delay)).alias(
                    "crawl_delay"
                ),
            )
        )
        out = out.join(F.broadcast(delays), "host", "left")
    else:
        out = out.withColumn(
            "crawl_delay", F.lit(None).cast("double")
        )
    slot_order = (
        [F.desc_nulls_last(priority_col), F.md5(F.col(url_col))]
        if priority_col is not None else [F.md5(F.col(url_col))]
    )
    slot = F.row_number().over(
        Window.partitionBy("host").orderBy(*slot_order)
    ) - F.lit(1)
    delay = F.coalesce("crawl_delay", F.lit(float(default_delay)))
    return (
        out.withColumn("fetch_slot", slot)
        .withColumn("crawl_delay", delay)
        .withColumn(
            "planned_offset_s", F.col("fetch_slot") * delay
        )
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 60,
    tol: float = 1e-6,
    check_every: int = 4,
) -> DataFrame:
    """Kleinberg HITS: (node, hub, authority), both scores L1-
    normalized to sum 1 (an L1 norm keeps the normalizer a plain SUM
    — same fixed point as the classical L2 up to scale). Power
    iteration on the unweighted adjacency: auth ∝ Aᵀ·hub then
    hub ∝ A·auth each round — two edge-keyed join+groupBy shuffles,
    the `pagerank` loop shape — with the normalizers riding the plan
    as broadcast 1-row aggregates and the L1 convergence delta
    collected every ``check_every`` rounds (zero per-round driver
    actions). Raises on non-convergence, same doctrine as
    `pagerank`. Nodes with no in-edges get authority 0, no out-edges
    hub 0."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )

    def normalized(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(
            F.coalesce(F.sum(col), F.lit(0.0)).alias("__total")
        )
        return (
            df.crossJoin(F.broadcast(total))
            .select(
                "node",
                F.when(
                    F.col("__total") > 0, F.col(col) / F.col("__total")
                )
                .otherwise(F.lit(0.0))
                .alias(col),
            )
        )

    def one_round(hub: DataFrame) -> DataFrame:
        """hub(node) → next L1-normalized hub frame; the auth frame is
        rebuilt from the returned hub by `auth_of` (same expressions,
        shared lineage)."""
        auth = normalized(
            nodes.join(
                e.join(
                    hub.withColumnRenamed("node", "src"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("__a")),
                "node",
                "left",
            ).select(
                "node", F.coalesce("__a", F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        return normalized(
            nodes.join(
                e.join(
                    auth.withColumnRenamed("node", "dst"), "dst"
                )
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("auth").alias("__h")),
                "node",
                "left",
            ).select(
                "node", F.coalesce("__h", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )

    hub = nodes.withColumn("hub", F.lit(1.0 / n)).localCheckpoint(
        eager=False
    )
    done = 0
    delta = None  # None = convergence never measured (max_iters < 1)
    while done < max_iters:
        steps = min(check_every, max_iters - done)
        prev = hub
        for _ in range(steps):
            prev = hub
            hub = one_round(hub).localCheckpoint(eager=False)
        done += steps
        delta = (
            hub.join(
                prev.select("node", F.col("hub").alias("__prev")), "node"
            )
            .agg(F.sum(F.abs(F.col("hub") - F.col("__prev"))))
            .collect()[0][0]
        )
        if delta is not None and delta < tol:
            break
    else:
        raise RuntimeError(
            f"hits did not converge in {max_iters} rounds (last L1 "
            f"delta {'unmeasured' if delta is None else f'{delta:.2e}'} "
            f">= tol {tol:.0e})"
        )
    # final authority from the converged hub, one more half-step
    auth = normalized(
        nodes.join(
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("__a")),
            "node",
            "left",
        ).select("node", F.coalesce("__a", F.lit(0.0)).alias("auth")),
        "auth",
    )
    return hub.join(auth, "node").select(
        "node", "hub", F.col("auth").alias("authority")
    )
