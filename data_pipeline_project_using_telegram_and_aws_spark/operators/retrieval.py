"""BM25 lexical retrieval over the document corpus — the non-embedding
half of similarity search: rank corpus documents against a small query
set by Okapi BM25. The LLM-pipeline uses are retrieval-based
decontamination (find corpus documents that *answer* an eval question
even when no long n-gram is shared — the gap ``decontamination.py``'s
exact-gram collisions leave) and nearest-lexical-neighbor audits of
generated text.

Scoring (Okapi BM25, the textbook form):

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

Scale shape (100 TB corpus × a small query set):
- document statistics (per-term tf, per-doc length, corpus df/avgdl) are
  one exploded aggregation — computed once, reusable across query sets
  (persist ``corpus_term_stats`` for the daily-batch shape);
- queries are tiny by nature, so their term set joins the per-term
  postings BROADCAST: the corpus never shuffles by term; the only
  corpus-sized shuffle is the final (query, doc) score aggregation,
  whose input is bounded by postings of the query terms (near-zero
  selectivity on a real vocabulary), not by corpus size — the same
  "join first, aggregate the survivors" shape as decontamination;
- everything is JVM-side expression work; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

K1 = 1.2
B = 0.75


def _term_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term"),
    )


def corpus_term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, dl, df, avgdl, n_docs) — the BM25 index rows:
    per-(doc, term) frequency with doc length, term document frequency,
    and the corpus constants attached (one-row aggregate broadcast by a
    cross join). The df attachment is the one term-keyed shuffle, paid
    at index-build time; persist the output (bucketed by term for a
    serving layout) to amortize across query sets."""
    tf = (
        _term_rows(docs, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "term", "tf", "dl", "df", "avgdl", "n_docs")
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    top: int | None = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query_id, doc_id, bm25) — BM25 score for every (query, corpus
    doc) pair sharing at least one term, top-``top`` per query (None =
    all pairs). Query terms are deduplicated (standard bag-of-words
    query form) and broadcast; corpus statistics come from
    :func:`corpus_term_stats`'s aggregation shape inlined here."""
    tf = (
        _term_rows(docs, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    n_avg = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        _term_rows(queries, query_id_col, query_text_col)
        .dropDuplicates([query_id_col, "term"])
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (K1 + 1.0)
        / (
            F.col("tf")
            + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_avg))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * tf_part), 4).alias("bm25"))
    )
    if top is None:
        return scored
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("bm25"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .orderBy(query_id_col, "rank")
    )
