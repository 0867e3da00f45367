"""URL and domain operators — the web-corpus curation surface every
public pretraining pipeline leans on (URL-level dedup keys, domain
blocklists, per-domain share caps) and the reference's web-facing
ingest hints at (the webhook URL handling, ipynb:151). Everything is
built from Spark's JVM-side ``try_parse_url`` plus higher-order array
functions — zero Python, zero UDFs; the parse itself evaluates via
the JVM ``ParseUrlEvaluator`` invoke inside the projection (not
whole-stage-codegen'd, but still scan-speed JVM work) — so the
normalization holds up on a 100 TB crawl.

Contracts:
- Unparseable URLs normalize to NULL (the ``parse_url`` convention);
  a curation pipeline FILTERS or quarantines on null, it never
  crashes — the one place the loud-failure doctrine yields, because
  malformed URLs are a bulk statistical fact of crawls, not a data
  defect to audit row by row.
- :func:`normalize_url` is a documented, specific recipe (lowercase
  scheme/host, strip default ports and fragments and userinfo, drop
  tracking parameters, SORT the surviving query parameters, drop a
  trailing ``/`` on the path); URL canonicalization has no universal
  standard, so the recipe is the contract — dedup keys built from it
  are stable across runs and engines, which is all dedup needs.
- :func:`registered_domain` is an eTLD+1 heuristic over a
  parameterizable multi-label-suffix SET (a small embedded default —
  co.uk and friends); :func:`registered_domain_psl` is the production
  path — it takes the REAL public suffix list (wildcards and
  exceptions included) and compiles it into one constant-folded map
  literal, so full-PSL correctness still costs zero joins and zero
  Python.
- IPv6 literal hosts keep their brackets through :func:`url_host`
  (the port strip never splits inside ``[...]``) and have no
  registrable domain (both registered_domain variants yield the host
  / NULL respectively rather than garbage labels).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# default tracking parameters to drop, lowercase (the usual suspects;
# extend per corpus)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_eid", "igshid",
)

# common multi-label public suffixes for the eTLD+1 heuristic
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.ar", "co.za",
)


def _part(url: Column, what: str) -> Column:
    # try_parse_url, not parse_url: invalid URLs must yield NULL (the
    # module contract), not throw mid-scan (Spark 4 parse_url raises
    # INVALID_URL)
    return F.try_parse_url(url, F.lit(what))


def url_host(url) -> Column:
    """Lowercased host with userinfo and port stripped; NULL for
    unparseable URLs. IPv6 literal hosts keep their brackets
    (``http://[::1]:8080/`` → ``[::1]``) — the ':'-split port strip
    applies only to unbracketed hosts, since IPv6 literals contain
    ':' inside the brackets."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.lower(_part(url, "HOST"))
    # parse_url's HOST keeps userinfo in some malformed cases; strip
    # defensively (last '@' wins, per the WHATWG parsing rule)
    host = F.element_at(F.split(host, "@"), -1)
    bracketed = F.regexp_extract(host, r"^(\[[^\]]*\])", 1)
    return F.when(
        F.startswith(host, F.lit("[")), F.nullif(bracketed, F.lit(""))
    ).otherwise(F.element_at(F.split(host, ":"), 1))


def registered_domain(
    url, multi_suffixes: tuple[str, ...] = DEFAULT_MULTI_SUFFIXES
) -> Column:
    """eTLD+1 heuristic: the last two host labels, or the last three
    when the last two form a known multi-label suffix (module
    docstring: pass the full public-suffix list in production)."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*multi_suffixes)
    # IP-literal hosts have no registrable labels: bracketed IPv6
    # (even IPv4-mapped forms containing dots) pass through unchanged
    return F.when(
        host.isNull() | (n <= 1) | F.startswith(host, F.lit("[")), host
    ).otherwise(F.when(is_multi & (n >= 3), last3).otherwise(last2))


def registered_domain_psl(
    url, suffixes, out_null_for_bare_suffix: bool = True
) -> Column:
    """eTLD+1 with a REAL public-suffix list — the production path the
    :func:`registered_domain` docstring points at. ``suffixes`` is the
    PSL as an iterable of rule strings or a single-column DataFrame
    (rules in publicsuffix.org syntax: ``com``, ``co.uk``, wildcard
    ``*.ck``, exception ``!www.ck``; comment/blank lines ignored).

    Matching follows the published algorithm: a rule matches when its
    labels equal the host's trailing labels (``*`` matching exactly
    one label); the prevailing rule is the exception if one matches,
    else the longest match, else the implicit ``*`` (bare TLD); the
    registrable domain is the public suffix plus one label — NULL when
    the host IS a public suffix (unlike the heuristic, which passes
    single-label hosts through; stated difference).

    Plan shape: the list compiles to ONE ``str_to_map`` literal the
    optimizer constant-folds — per row the match is ≤ 2·max_labels
    map probes over the host's trailing-label keys, a pure projection:
    no join, no shuffle, no Python (the PSL is a ~9k-entry dimension
    "table" small enough to ride the plan itself, the same judgment
    that broadcasts a dimension instead of shuffling for it)."""
    if isinstance(suffixes, DataFrame):
        col0 = suffixes.columns[0]
        rules = [r[col0] for r in suffixes.select(col0).collect()]
    else:
        rules = list(suffixes)
    # value encoding: ps_label_count * 10 + kind (2 exception beats
    # 1 exact beats 0 wildcard at equal length)
    entries: dict[str, int] = {}
    max_l = 1
    for raw in rules:
        rule = (raw or "").strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if any(ch in rule for ch in ",:"):  # str_to_map delimiters
            raise ValueError(f"registered_domain_psl: bad rule {raw!r}")
        if rule.startswith("!"):
            body = rule[1:]
            key, ps_n, kind = body, body.count(".") , 2
        elif rule.startswith("*."):
            key, ps_n, kind = rule, rule.count(".") + 1, 0
        else:
            key, ps_n, kind = rule, rule.count(".") + 1, 1
        max_l = max(max_l, key.count(".") + 1)
        prev = entries.get(key)
        code = ps_n * 10 + kind
        if prev is None or code > prev:
            entries[key] = code
    payload = ",".join(f"{k}:{v}" for k, v in sorted(entries.items()))
    psl_map = F.str_to_map(F.lit(payload), F.lit(","), F.lit(":"))
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def _tail(ln: int) -> Column:
        return F.array_join(F.slice(labels, n - F.lit(ln) + 1, ln), ".")

    # the published precedence: a matching EXCEPTION rule prevails
    # over everything, else the longest match, else the implicit "*"
    exc_branches = []
    branches = []
    for ln in range(max_l, 0, -1):
        exact = F.element_at(psl_map, _tail(ln)).cast("int")
        wild = (
            F.element_at(
                psl_map, F.concat(F.lit("*."), _tail(ln - 1))
            ).cast("int")
            if ln >= 2
            else F.lit(None).cast("int")
        )
        exc_branches.append(
            F.when(
                (n >= ln) & (exact % 10 == 2),
                F.floor(exact / 10).cast("int"),
            )
        )
        branches.append(
            F.when(
                n >= ln,
                F.floor(F.coalesce(exact, wild) / 10).cast("int"),
            )
        )
    ps_n = F.coalesce(*exc_branches, *branches, F.lit(1))
    reg = F.array_join(
        F.slice(labels, n - ps_n, ps_n + F.lit(1)), "."
    )
    bare = F.lit(None).cast("string") if out_null_for_bare_suffix else host
    return F.when(
        host.isNull() | F.startswith(host, F.lit("[")),
        F.lit(None).cast("string"),
    ).when(n <= ps_n, bare).otherwise(reg)


def normalize_url(
    url,
    drop_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """The canonical dedup key (recipe in the module docstring).
    Whole-stage codegen: parse_url parts + array higher-order
    functions, no Python."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.element_at(F.split(url, "://"), 1))
    host = url_host(url)
    # ports: url_host drops ':port' and the rebuild omits it entirely
    # — canonical keys carry no port (the non-default-port collision
    # is accepted and documented: dedup keys, not fetch addresses)
    # trailing slash: /a/b/ == /a/b for dedup purposes; "/" becomes ""
    path = F.coalesce(_part(url, "PATH"), F.lit(""))
    path = F.when(
        F.endswith(path, F.lit("/")) & (F.length(path) > 1),
        F.substring(path, 1, F.length(path) - F.lit(1)),
    ).when(path == "/", F.lit("")).otherwise(path)
    query = _part(url, "QUERY")
    drops = F.array(*[F.lit(p) for p in drop_params])
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (F.length(p) > 0)
        & ~F.array_contains(
            drops, F.lower(F.element_at(F.split(p, "="), 1))
        ),
    )
    qnorm = F.array_join(F.array_sort(kept), "&")
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qnorm == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qnorm)
            ),
        )
    )


def domain_report(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    suffixes=None,
) -> DataFrame:
    """Per registered domain: document count, share of documents, and
    (when ``text_col`` given) token count and token share — the
    domain-concentration read a share-cap policy thresholds on. One
    aggregation; operand is domain-count-sized. ``suffixes``: pass the
    real public-suffix list to key domains with
    :func:`registered_domain_psl` instead of the heuristic."""
    dom = (
        registered_domain(url_col)
        if suffixes is None
        else registered_domain_psl(url_col, suffixes)
    ).alias("domain")
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if text_col is not None:
        aggs.append(
            F.sum(
                F.size(F.filter(
                    F.split(F.col(text_col), r"\s+"),
                    lambda t: F.length(t) > 0,
                ))
            ).alias("n_tokens")
        )
    out = df.select(
        dom, *([F.col(text_col)] if text_col else [])
    ).groupBy("domain").agg(*aggs)
    # totals ride a broadcast ONE-ROW scalar attachment (the house
    # pattern for share denominators), not a global window
    tot_aggs = [F.sum("n_docs").alias("__td")]
    if text_col is not None:
        tot_aggs.append(F.sum("n_tokens").alias("__tt"))
    out = out.crossJoin(F.broadcast(out.agg(*tot_aggs)))
    cols = [
        "domain",
        "n_docs",
        F.round(F.col("n_docs") / F.col("__td"), 6).alias("doc_share"),
    ]
    if text_col is not None:
        cols += [
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__tt"), 6).alias(
                "token_share"
            ),
        ]
    return out.select(*cols).orderBy(F.desc("n_docs"), "domain")


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    suffixes=None,
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (a (domain) DataFrame — blocklists are small by nature, so the
    anti-join broadcasts; the corpus never shuffles). Subdomains of a
    blocked domain are blocked too (the eTLD+1 key makes that
    automatic). ``suffixes``: pass the real public-suffix list to key
    rows with :func:`registered_domain_psl` instead of the heuristic
    (blocklist entries must then be PSL-keyed too)."""
    dom = (
        registered_domain(url_col)
        if suffixes is None
        else registered_domain_psl(url_col, suffixes)
    ).alias("__domain")
    return (
        df.withColumn("__domain", dom)
        .join(
            F.broadcast(
                blocklist.select(
                    F.lower(F.col(domain_col)).alias("__domain")
                ).distinct()
            ),
            "__domain",
            "left_anti",
        )
        .drop("__domain")
    )
