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
    ratio, mean token length — the cheap pre-LLM quality gate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^!?.,;:]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tok.cast("long").alias("n_tokens"),
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


def tx5_token_histogram(spark, sf_dir):
    """Regex (word-char) tokenizer → document-length histogram."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda t: t != ""
    )
    return (
        docs.select(F.size(toks).cast("long").alias("n_tokens"))
        .groupBy("n_tokens")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("n_tokens")
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
    "tx3_langid_heuristic": tx3_langid_heuristic,
    "tx4_fingerprints": tx4_fingerprints,
    "tx5_token_histogram": tx5_token_histogram,
    "tx6_document_frequency": tx6_document_frequency,
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
               ROUND(LENGTH(regexp_replace(text, '[^!?.,;:]', '', 'g'))
                     / LENGTH(text), 4) AS punct_ratio,
               ROUND(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                     / len(toks), 4) AS stopword_ratio,
               ROUND((LENGTH(text) - len(toks) + 1) / len(toks), 4)
                   AS mean_token_len
        FROM t ORDER BY doc_id
    """,
    "tx3_langid_heuristic": f"""
        WITH t AS (
            SELECT lang,
                   CASE WHEN len(list_filter(
                            list_filter(string_split(text, ' '), x -> x <> ''),
                            x -> x IN {_EN_SQL})) > 0
                        THEN 'en' ELSE 'unk' END AS predicted_lang
            FROM documents
        )
        SELECT lang, predicted_lang, COUNT(1) AS n_docs
        FROM t GROUP BY lang, predicted_lang
        ORDER BY lang, predicted_lang
    """,
    "tx4_fingerprints": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fingerprint,
               substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))),
                      1, 12) AS shard_key
        FROM documents ORDER BY doc_id
    """,
    "tx5_token_histogram": """
        WITH t AS (
            SELECT CAST(len(list_filter(
                       string_split_regex(text, '[^a-zA-Z0-9]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT n_tokens, COUNT(1) AS n_docs
        FROM t GROUP BY n_tokens ORDER BY n_tokens
    """,
    "tx6_document_frequency": """
        WITH term_doc AS (
            SELECT DISTINCT doc_id, UNNEST(
                list_filter(string_split(text, ' '), x -> x <> '')) AS term
            FROM documents
        ),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT term, COUNT(1) AS df,
               ROUND(LN((SELECT n_docs FROM n) / COUNT(1)), 6) AS idf
        FROM term_doc
        GROUP BY term
        ORDER BY df DESC, term
    """,
}
