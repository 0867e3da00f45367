"""HTML → text extraction, Spark-first — the step between a WARC
response payload (`sources/warc.py`) and every text operator in this
repo (quality, langid, dedup, DSIR). On a 100 TB crawl this runs on
every document, so it is built from JVM ``regexp_replace`` chains and
higher-order array functions: ZERO Python, whole plan in codegen.

Three layers, each usable alone:

- :func:`html_to_text`: markup strip — remove script/style/head/
  comments wholesale, turn block-level tags into newlines, drop every
  remaining tag (inline tags vanish without a space — browser
  semantics), decode character references IN FULL: the complete HTML5
  named table (2.1k entries from the stdlib ``html.entities`` spec
  data, compiled to one constant-folded ``str_to_map`` literal — the
  `urls.registered_domain_psl` pattern) plus arbitrary decimal/hex
  numeric references, whose UTF-8 bytes are constructed JVM-side with
  ``decode(unhex(...))`` — astral code points included, still zero
  Python. Stated limits: semicolon-terminated references only (the
  legacy no-semicolon forms are a quirks-mode compatibility list);
  unknown names pass through as literal text, invalid numeric
  references become U+FFFD per spec.
- :func:`extract_main_text`: block-level boilerplate gate — the
  text-to-anchor-density heuristic (the published Boilerpipe/JusText
  family's core signal): split the page into blocks on block-tag
  boundaries, compute per block the visible-text length and the
  fraction of it inside ``<a>`` tags, keep blocks that are long
  enough and link-sparse enough, reassemble. Nav bars, footers, and
  link farms are short and anchor-dense; body prose is long and
  anchor-sparse. Thresholds are parameters with the published-ish
  defaults, not magic.
- :func:`html_metadata`: title / meta-description / lang / canonical
  via anchored ``regexp_extract`` — the projection a crawl-triage
  pass reads before deciding to extract at all.

This complements `operators/boilerplate.py` (which deduplicates
repeated TEXT lines across a site once markup is gone): html.py is
markup → text, boilerplate.py is text → cleaned corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tags whose CONTENT is invisible and must vanish wholesale
_DROP_CONTENT = ("script", "style", "noscript", "svg", "head", "template")

# tags that delimit visual blocks: become newlines, not spaces
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|"
    "header|footer|nav|aside|blockquote|pre|figure|figcaption|hr"
)


def _strip_invisible(col: Column) -> Column:
    for tag in _DROP_CONTENT:
        col = F.regexp_replace(
            col, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " "
        )
    return F.regexp_replace(col, r"(?s)<!--.*?-->", " ")


def _entity_payload() -> str:
    """The full HTML5 named-entity table (stdlib ``html.entities`` —
    public spec data, built at runtime so no 2k-line literal lives in
    the source), rendered for ``str_to_map`` with control-character
    delimiters no entity name or value contains. Semicolon-terminated
    names only — the spec's legacy no-semicolon forms are a browser
    quirks-mode compatibility list, stated out of scope."""
    import html.entities

    pairs = [
        (name[:-1], value)
        for name, value in html.entities.html5.items()
        if name.endswith(";")
    ]
    return "\x1f".join(f"{n}\x1e{v}" for n, v in sorted(pairs))


_ENTITY_PAYLOAD = _entity_payload()


def _codepoint_str(cp: Column) -> Column:
    """Unicode code point (int Column) → its string, fully JVM-side:
    build the UTF-8 byte sequence as hex and ``decode(unhex(...))``.
    Invalid code points (surrogates, > U+10FFFF) yield NULL for the
    caller to fall back on."""
    b = lambda x: F.lpad(F.hex(x.cast("int")), 2, "0")  # noqa: E731
    cont = lambda x: b(F.lit(0x80) + x % 64)  # noqa: E731
    # cp == 0 falls through every branch (HTML5: &#0; is U+FFFD, the
    # caller's coalesce); surrogates are excluded from BOTH the 3- and
    # 4-byte branches (the 4-byte floor 0x10000 keeps them out) so they
    # reach NULL instead of an invalid UTF-8 sequence
    h = (
        F.when(cp.between(1, 0x7F), b(cp))
        .when(
            cp.between(0x80, 0x7FF),
            F.concat(b(F.lit(0xC0) + (cp / 64).cast("long")), cont(cp)),
        )
        .when(
            cp.between(0x800, 0xFFFF) & ~cp.between(0xD800, 0xDFFF),
            F.concat(
                b(F.lit(0xE0) + (cp / 4096).cast("long")),
                cont((cp / 64).cast("long")),
                cont(cp),
            ),
        )
        .when(
            cp.between(0x10000, 0x10FFFF),
            F.concat(
                b(F.lit(0xF0) + (cp / 262144).cast("long")),
                cont((cp / 4096).cast("long")),
                cont((cp / 64).cast("long")),
                cont(cp),
            ),
        )
    )
    return F.decode(F.unhex(h), "UTF-8")


def _decode_entities(col: Column) -> Column:
    """Decode ALL semicolon-terminated character references: the full
    HTML5 named table (one constant-folded ``str_to_map`` literal,
    same pattern as `urls.registered_domain_psl`) plus arbitrary
    decimal/hex numeric references via JVM UTF-8 byte construction —
    zero Python, single-unescape semantics (``&amp;lt;`` → ``&lt;``;
    decoded output is never rescanned). Unknown names pass through as
    literal text; invalid numeric references (surrogates, out of
    range) decode to U+FFFD per the HTML5 spec."""
    emap = F.str_to_map(
        F.lit(_ENTITY_PAYLOAD), F.lit("\x1f"), F.lit("\x1e")
    )
    pieces = F.split(col, r"(?=&)")

    def fix(p: Column) -> Column:
        name = F.regexp_extract(p, r"^&([a-zA-Z][a-zA-Z0-9]*);", 1)
        dec = F.regexp_extract(p, r"^&#([0-9]+);", 1)
        hexd = F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]+);", 1)
        named_val = F.element_at(emap, name)
        # try_cast: absurdly long digit runs overflow to NULL (not an
        # ANSI throw) and land on the U+FFFD branch like any other
        # out-of-range reference
        dec_val = _codepoint_str(dec.try_cast("long"))
        # conv() wraps silently past 64 bits: >16 hex digits cannot
        # be a valid code point, force them onto the U+FFFD branch
        hex_val = F.when(
            F.length(hexd) <= 16,
            _codepoint_str(F.conv(hexd, 16, 10).try_cast("long")),
        )
        # HTML5: out-of-range / surrogate numeric references decode
        # to U+FFFD, they do not pass through
        repl = F.lit("\ufffd")
        return (
            F.when(
                (name != "") & named_val.isNotNull(),
                F.concat(
                    named_val, F.substr(p, F.length(name) + F.lit(3))
                ),
            )
            .when(
                dec != "",
                F.concat(
                    F.coalesce(dec_val, repl),
                    F.substr(p, F.length(dec) + F.lit(4)),
                ),
            )
            .when(
                hexd != "",
                F.concat(
                    F.coalesce(hex_val, repl),
                    F.substr(p, F.length(hexd) + F.lit(5)),
                ),
            )
            .otherwise(p)
        )

    return F.array_join(F.transform(pieces, fix), "")


def html_to_text(html) -> Column:
    """Visible text of an HTML document (contract in the module
    docstring). NULL input stays NULL; non-HTML text passes through
    minimally changed (no tags to strip)."""
    col = F.col(html) if isinstance(html, str) else html
    col = _strip_invisible(col)
    col = F.regexp_replace(col, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    # remaining (inline) tags vanish WITHOUT a space — browser
    # semantics: <b>bold</b>text renders "boldtext"
    col = F.regexp_replace(col, r"(?s)<[^>]*>", "")
    col = _decode_entities(col)
    col = F.regexp_replace(col, r"[ \t\x0b\f\r]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{2,}", "\n\n")
    # btrim, not trim: trim strips only spaces, the edges here are
    # newlines from boundary block tags
    return F.btrim(col, F.lit(" \n\t"))


def _attr_value(tag: Column, attr: str) -> Column:
    """Value of ``attr`` inside one already-matched tag body —
    attribute-order-insensitive, double-quoted / single-quoted /
    unquoted all legal per the HTML5 syntax. The lookbehind keeps
    ``data-content=`` from satisfying ``content=``; quoted forms win
    over a later unquoted homonym because they're coalesced first."""
    dq = F.regexp_extract(tag, rf'(?i)(?<![-\w]){attr}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(tag, rf"(?i)(?<![-\w]){attr}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(
        tag, rf"(?i)(?<![-\w]){attr}\s*=\s*([^\"'\s>]+)", 1
    )
    e = lambda c: F.nullif(c, F.lit(""))  # noqa: E731
    return F.coalesce(e(dq), e(sq), e(uq))


def _tags(col: Column, name: str) -> Column:
    """Array of every ``<name ...>`` open tag in the document (the tag
    text itself, for `_attr_value` to pick attributes out of)."""
    return F.regexp_extract_all(
        col, F.lit(rf"(?is)<{name}\b[^>]*>"), F.lit(0)
    )


def _first_tag_attr(col: Column, tag: str, key: str, val: str, want: str) -> Column:
    """``want``-attribute of the first ``<tag>`` whose ``key``
    attribute equals ``val`` (case-insensitive) — the shared shape of
    meta-description / link-canonical lookup."""
    hit = F.filter(
        _tags(col, tag),
        lambda t: F.lower(_attr_value(t, key)) == val,
    )
    # try_element_at: empty array (no matching tag) → NULL, not an
    # ANSI index error
    return _attr_value(F.try_element_at(hit, F.lit(1)), want)


def html_metadata(html) -> Column:
    """Struct(title, description, lang, canonical) — each NULL when
    absent; one projection, no Python. Attribute extraction is
    order-insensitive (``<meta content=".." name="description">`` is
    as legal as the reverse) and accepts unquoted values."""
    col = F.col(html) if isinstance(html, str) else html
    title = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title", 1)
    desc = _first_tag_attr(col, "meta", "name", "description", "content")
    lang = _attr_value(
        F.regexp_extract(col, r"(?is)<html\b[^>]*>", 0), "lang"
    )
    canon = _first_tag_attr(col, "link", "rel", "canonical", "href")
    null_if_empty = lambda c: F.nullif(F.trim(c), F.lit(""))  # noqa: E731
    return F.struct(
        null_if_empty(_decode_entities(title)).alias("title"),
        null_if_empty(_decode_entities(F.coalesce(desc, F.lit("")))).alias(
            "description"
        ),
        null_if_empty(F.coalesce(lang, F.lit(""))).alias("lang"),
        null_if_empty(F.coalesce(canon, F.lit(""))).alias("canonical"),
    )


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    min_block_chars: int = 40,
    max_anchor_ratio: float = 0.33,
) -> DataFrame:
    """Boilerplate-gated extraction: keep blocks whose visible text is
    ≥ ``min_block_chars`` long with < ``max_anchor_ratio`` of it
    inside anchors, joined by blank lines (module docstring). The
    whole computation is array higher-order functions over the block
    split — per-row work linear in document size, no explode, no
    shuffle, no Python."""
    col = F.col(html_col)
    cleaned = _strip_invisible(col)
    # mark anchor text BEFORE stripping tags so the density signal
    # survives: <a ...>x</a> -> \x01x\x02
    marked = F.regexp_replace(
        cleaned, r"(?is)<a\b[^>]*>(.*?)</a\s*>", "\x01$1\x02"
    )
    marked = F.regexp_replace(
        marked, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n\n"
    )
    marked = F.regexp_replace(marked, r"(?s)<[^>]*>", "")
    marked = _decode_entities(marked)
    blocks = F.split(marked, r"\n{2,}")

    def visible(b):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(b, "[\x01\x02]", ""), r"\s+", " "
            )
        )

    def anchor_len(b):
        # total characters between markers: strip everything outside
        # \x01..\x02 spans, then count (robust to multiple anchors)
        only = F.regexp_replace(
            F.concat(F.lit("\x02"), b, F.lit("\x01")),
            r"(?s)\x02[^\x01]*\x01",
            "",
        )
        return F.length(F.regexp_replace(only, r"\s+", " "))

    kept = F.filter(
        blocks,
        lambda b: (F.length(visible(b)) >= min_block_chars)
        & (
            anchor_len(b)
            < F.length(visible(b)) * F.lit(float(max_anchor_ratio))
        ),
    )
    joined = F.array_join(F.transform(kept, visible), "\n\n")
    return df.withColumn(out_col, F.nullif(joined, F.lit("")))


def robots_noindex(html) -> Column:
    """TRUE when the page opts out of indexing via
    ``<meta name="robots" ...>`` (or the googlebot variant) carrying
    ``noindex`` or ``none`` — the crawl-policy gate responsible
    corpus builders apply before text ever enters the pipeline.
    NULL input → NULL; absent meta → FALSE."""
    col = F.col(html) if isinstance(html, str) else html

    def tag_hit(t: Column) -> Column:
        name = F.lower(_attr_value(t, "name"))
        content = F.lower(F.coalesce(_attr_value(t, "content"), F.lit("")))
        return name.isin("robots", "googlebot") & content.rlike(
            r"(^|[,\s])(noindex|none)([,\s]|$)"
        )

    # EVERY meta tag is checked (attribute order and quoting free):
    # a page with <meta content=noindex name=robots> after five other
    # metas still gates out
    hit = F.exists(_tags(col, "meta"), tag_hit)
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.coalesce(hit, F.lit(False))
    )


def opengraph_metadata(html) -> Column:
    """Struct(og_title, og_description, og_type, og_image, og_url,
    article_published) from OpenGraph / article ``<meta property=..
    content=..>`` tags — the social-graph metadata block news sites
    carry; each NULL when absent. Same order-insensitive attribute
    machinery as `html_metadata` (``property=`` instead of
    ``name=``), one projection, no Python."""
    col = F.col(html) if isinstance(html, str) else html

    def prop(name: str) -> Column:
        raw = _first_tag_attr(col, "meta", "property", name, "content")
        return F.nullif(
            F.trim(_decode_entities(F.coalesce(raw, F.lit("")))),
            F.lit(""),
        )

    return F.struct(
        prop("og:title").alias("og_title"),
        prop("og:description").alias("og_description"),
        prop("og:type").alias("og_type"),
        prop("og:image").alias("og_image"),
        prop("og:url").alias("og_url"),
        prop("article:published_time").alias("article_published"),
    )


def jsonld_metadata(html) -> Column:
    """Struct(ld_type, headline, author, date_published, publisher)
    from the FIRST ``<script type="application/ld+json">`` block —
    the schema.org metadata articles/recipes/products embed. The
    block's JSON parses JVM-side via ``get_json_object``; an
    ``@graph`` wrapper is followed one level (first element). Author
    and publisher accept both the object form ({"name": ..}) and the
    bare-string form. Unparseable JSON → all-NULL struct (metadata
    absence is data, not a defect). One projection, no Python."""
    col = F.col(html) if isinstance(html, str) else html
    block = F.regexp_extract(
        col,
        r"(?is)<script\b[^>]*type\s*=\s*[\"']?application/ld\+json"
        r"[\"']?[^>]*>(.*?)</script",
        1,
    )
    block = F.nullif(F.trim(block), F.lit(""))
    # follow an @graph wrapper one level, or a top-level ARRAY's
    # first element (both common real-world shapes); else the block
    graph0 = F.get_json_object(block, "$['@graph'][0]")
    arr0 = F.get_json_object(block, "$[0]")
    node = F.coalesce(graph0, arr0, block)

    def field(path: str) -> Column:
        return F.nullif(F.get_json_object(node, path), F.lit(""))

    author = F.coalesce(field("$.author.name"), field("$.author[0].name"),
                        field("$.author"))
    publisher = F.coalesce(field("$.publisher.name"), field("$.publisher"))
    return F.struct(
        field("$['@type']").alias("ld_type"),
        F.coalesce(field("$.headline"), field("$.name")).alias("headline"),
        author.alias("author"),
        F.coalesce(field("$.datePublished"),
                   field("$.dateCreated")).alias("date_published"),
        publisher.alias("publisher"),
    )
