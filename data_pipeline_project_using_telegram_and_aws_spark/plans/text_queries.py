"""Text-analysis queries over ``documents`` (north-star extension:
language-ID heuristic, quality scoring, token counting, fingerprinting,
df/idf stats). All expressions are JVM-side built-ins with exact DuckDB
oracles; ratios are rounded so float division differences can't bite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table

# tiny marker lists for the n-gram/stopword language heuristic
_EN_MARKERS = ["the", "a", "and", "of"]
_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != "")


def tx1_token_stats_by_lang(spark, sf_dir):
    """Whitespace-token statistics per language tag."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.size(_tokens(F.col("text"))).alias("n"))
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.round(F.avg("n"), 2).alias("avg_tokens"),
            F.max("n").cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


def tx2_quality_scores(spark, sf_dir):
    """Per-document quality signals: length, punctuation ratio, stopword
    ratio, mean token length, plus the regex (word-char) token count —
    the cheap pre-LLM quality gate. The regex tokenizer column absorbs
    former tx5_token_histogram: its histogram is a one-group-by away from
    this row-level output, so the driver row checks the tokenizer at full
    per-document granularity instead."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_retok = F.size(
        F.filter(F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda t: t != "")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^!?.,;:]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tok.cast("long").alias("n_tokens"),
        n_retok.cast("long").alias("n_tokens_regex"),
        F.round(n_punct / F.length("text"), 4).alias("punct_ratio"),
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        F.round(
            (F.length("text") - n_tok + 1) / n_tok, 4
        ).alias("mean_token_len"),
    ).orderBy("doc_id")


def tx3_langid_heuristic(spark, sf_dir):
    """Stopword-marker language ID: en if any marker token present, else
    unk; reports agreement with the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    en_hits = F.size(F.filter(toks, lambda t: t.isin(*_EN_MARKERS)))
    pred = F.when(en_hits > 0, "en").otherwise("unk")
    return (
        docs.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def tx4_fingerprints(spark, sf_dir):
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    + a 12-hex shard prefix (the content-addressed dedup/shard key)."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), "\\s+", " ")))
    fp = F.md5(normalized.cast("binary"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 12).alias("shard_key"),
    ).orderBy("doc_id")


def tx7_repetition_scores(spark, sf_dir):
    """Gopher-style intra-document repetition signals: the duplicate
    trigram fraction (1 − distinct/total trigrams) and the top single
    token's share of the document — the filters that catch boilerplate
    and keyword-stuffed documents.

    Scale shape: two exploded aggregations (grams, tokens), each with
    map-side partial agg, joined back on doc_id — linear in corpus size.
    Documents shorter than 3 tokens have no trigrams and drop out (the
    synthetic corpus has none)."""
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    g = (
        shingle_rows(docs, 3, "doc_id", "text", distinct=False)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.countDistinct("shingle").alias("__n_distinct"),
        )
    )
    tm = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.max("__c").alias("__top_n"),
            F.sum("__c").cast("long").alias("__n_tokens"),
        )
    )
    return (
        g.join(tm, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            F.round(
                F.lit(1) - F.col("__n_distinct") / F.col("n_grams"), 4
            ).alias("dup_trigram_frac"),
            F.round(F.col("__top_n") / F.col("__n_tokens"), 4).alias(
                "top_token_ratio"
            ),
        )
        .orderBy("doc_id")
    )


def tx6_document_frequency(spark, sf_dir):
    """Corpus df/idf table: per-term document frequency and idf — the
    shared statistic behind tf-idf ranking and rare-term filters.

    Corpus size is computed IN-PLAN (one-row aggregate attached via a
    broadcast cross join), not with a driver-side ``count()`` — a second
    full corpus scan at 100 TB and an extra job per invocation."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    term_doc = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    )
    return (
        term_doc.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.round(
                F.log(F.col("__n_docs").cast("double") / F.col("df")), 6
            ).alias("idf"),
        )
        .orderBy(F.desc("df"), "term")
    )


QUERIES = {
    "tx1_token_stats_by_lang": tx1_token_stats_by_lang,
    "tx2_quality_scores": tx2_quality_scores,
    # tx4_fingerprints left the 50-row registry in round 4: its whole-doc
    # md5 fingerprint + shard key are hash-checked as columns of dd5
    # (dedup_queries); still callable and pinned by
    # tests/test_registry_consolidation.py.
    # tx3_langid_heuristic left in round 5 (funding lm1/rt1): it is a
    # 10-row confusion-matrix view over tx1's exact token machinery —
    # the marker-filter expression it adds is pinned against a directly
    # computed confusion matrix in tests/test_registry_consolidation.py.
    # tx6_document_frequency left the 50-row registry in round 5
    # (funding lm2): its df computation is build_vocab's df stage
    # verbatim (same explode-distinct-groupBy), which vc1 hash-checks
    # end-to-end — token ids ARE the df ranking, so a df error flips
    # vc1's hash; the idf expression it adds on top is pinned against a
    # directly computed expectation in
    # tests/test_registry_consolidation.py. Still callable.
    "tx7_repetition_scores": tx7_repetition_scores,
}

_STOP_SQL = "('" + "','".join(_STOPWORDS) + "')"
_EN_SQL = "('" + "','".join(_EN_MARKERS) + "')"

ORACLE = {
    "tx1_token_stats_by_lang": """
        WITH t AS (
            SELECT lang,
                   len(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS n
            FROM documents
        )
        SELECT lang,
               COUNT(1) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS total_tokens,
               ROUND(AVG(n), 2) AS avg_tokens,
               CAST(MAX(n) AS BIGINT) AS max_tokens
        FROM t GROUP BY lang ORDER BY lang
    """,
    "tx2_quality_scores": f"""
        WITH t AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens_regex,
               ROUND(LENGTH(regexp_replace(text, '[^!?.,;:]', '', 'g'))
                     / LENGTH(text), 4) AS punct_ratio,
               ROUND(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                     / len(toks), 4) AS stopword_ratio,
               ROUND((LENGTH(text) - len(toks) + 1) / len(toks), 4)
                   AS mean_token_len
        FROM t ORDER BY doc_id
    """,
    "tx7_repetition_scores": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ),
        grams AS (
            SELECT doc_id, l[g] || ' ' || l[g+1] || ' ' || l[g+2] AS gram
            FROM toks,
                 UNNEST(generate_series(1, greatest(len(l) - 2, 0))) AS t(g)
        ),
        g AS (
            SELECT doc_id, COUNT(1) AS n_grams,
                   COUNT(DISTINCT gram) AS n_distinct
            FROM grams GROUP BY doc_id
        ),
        tok AS (
            SELECT doc_id,
                   UNNEST(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS token
            FROM documents
        ),
        tc AS (
            SELECT doc_id, token, COUNT(1) AS c FROM tok GROUP BY doc_id, token
        ),
        tm AS (
            SELECT doc_id, MAX(c) AS top_n,
                   CAST(SUM(c) AS BIGINT) AS n_tokens
            FROM tc GROUP BY doc_id
        )
        SELECT doc_id, n_grams,
               ROUND(1 - n_distinct / CAST(n_grams AS DOUBLE), 4)
                   AS dup_trigram_frac,
               ROUND(top_n / CAST(n_tokens AS DOUBLE), 4) AS top_token_ratio
        FROM g JOIN tm USING (doc_id)
        ORDER BY doc_id
    """,
}
