"""HTML → text extraction, Spark-first — the step between a WARC
response payload (`sources/warc.py`) and every text operator in this
repo (quality, langid, dedup, DSIR). On a 100 TB crawl this runs on
every document, so it is built from JVM ``regexp_replace`` chains and
higher-order array functions: ZERO Python, whole plan in codegen.

Three layers, each usable alone:

- :func:`html_to_text`: markup strip — remove script/style/head/
  comments wholesale, turn block-level tags into newlines, drop every
  remaining tag, decode the COMMON entities (named set below +
  decimal/hex numeric for the Latin-1 range via a fixed chain),
  squeeze whitespace. The entity contract is stated: exotic named
  entities pass through as literal text rather than silently
  corrupting (the honest failure mode for a regexp pipeline; a full
  HTML5 entity table is a 2k-entry ``str_to_map`` away if a corpus
  needs it, same pattern as `urls.registered_domain_psl`).
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

# the named entities worth decoding inline (the overwhelming bulk of
# real-crawl occurrences); order matters only for &amp; which must go
# LAST so "&amp;lt;" decodes to "&lt;" (double-escaped stays escaped
# once — the correct, information-preserving order)
_NAMED_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
    ("&mdash;", "—"), ("&ndash;", "–"), ("&hellip;", "…"),
    ("&rsquo;", "’"), ("&lsquo;", "‘"),
    ("&rdquo;", "”"), ("&ldquo;", "“"), ("&copy;", "©"),
    ("&amp;", "&"),
]

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


def _decode_entities(col: Column) -> Column:
    for src, dst in _NAMED_ENTITIES:
        col = F.replace(col, F.lit(src), F.lit(dst))
    # numeric entities: decimal and hex, decoded via a JVM lambda over
    # the split pieces would need char(); the pragmatic fixed chain
    # covers the Latin-1 punctuation crawls actually contain
    for code, ch in ((8217, "’"), (8220, "“"), (8221, "”"),
                     (8211, "–"), (8212, "—"), (160, " "),
                     (38, "&"), (60, "<"), (62, ">")):
        col = F.replace(col, F.lit(f"&#{code};"), F.lit(ch))
        col = F.replace(col, F.lit(f"&#x{code:x};"), F.lit(ch))
    return col


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


def html_metadata(html) -> Column:
    """Struct(title, description, lang, canonical) — each NULL when
    absent; one projection, no Python."""
    col = F.col(html) if isinstance(html, str) else html
    title = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title", 1)
    desc = F.regexp_extract(
        col,
        r"(?is)<meta\s[^>]*name=[\"']description[\"'][^>]*"
        r"content=[\"']([^\"']*)",
        1,
    )
    lang = F.regexp_extract(
        col, r"(?is)<html\s[^>]*lang=[\"']([a-zA-Z-]+)", 1
    )
    canon = F.regexp_extract(
        col,
        r"(?is)<link\s[^>]*rel=[\"']canonical[\"'][^>]*"
        r"href=[\"']([^\"']*)",
        1,
    )
    null_if_empty = lambda c: F.nullif(F.trim(c), F.lit(""))  # noqa: E731
    return F.struct(
        null_if_empty(_decode_entities(title)).alias("title"),
        null_if_empty(_decode_entities(desc)).alias("description"),
        null_if_empty(lang).alias("lang"),
        null_if_empty(canon).alias("canonical"),
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
