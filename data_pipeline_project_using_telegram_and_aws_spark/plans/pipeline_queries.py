"""Training-data pipeline queries: sequence packing (pk1) and benchmark
decontamination (dc1) over ``documents`` — north-star ops a pretraining
pipeline runs after curation (cu1) and before the dataloader.

Both are oracle-checked end to end. Packing's shard assignment uses the
md5-derived portable shard (:func:`operators.packing.md5_shard`) instead
of the default xxhash64 precisely so the *layout itself* — shard, dense
sequence ids, per-sequence fill — is reproducible in ANSI SQL, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.decontamination import contamination_report
from ..operators.packing import md5_shard, pack_sequences, packing_stats
from ..sources.tables import load_table

PK_BUDGET = 256   # tokens per packed sequence (docs average ~50 tokens)
PK_SHARDS = 8
DC_NGRAM = 4      # collision gram size tuned to the synthetic vocabulary
DC_EVAL_MOD = 29  # doc_id % 29 == 0 -> held-out "benchmark" split


def pk1_sequence_packing(spark, sf_dir):
    """Per-sequence packing stats (shard, seq_id, n_docs, seq_tokens,
    fill_ratio, overflows) for the whole corpus packed into
    ``PK_BUDGET``-token sequences across ``PK_SHARDS`` hash shards."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs,
        budget=PK_BUDGET,
        n_shards=PK_SHARDS,
        shard=md5_shard("doc_id", PK_SHARDS),
    )
    return packing_stats(packed, PK_BUDGET).orderBy("shard", "seq_id")


def dc1_decontamination(spark, sf_dir):
    """Train/eval n-gram overlap report: the held-out split is
    ``doc_id % DC_EVAL_MOD == 0``; every training doc sharing a
    ``DC_NGRAM``-gram with an eval doc is reported with the collision
    count and contaminated fraction of the eval doc."""
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % DC_EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % DC_EVAL_MOD != 0)
    return contamination_report(train, eval_docs, n=DC_NGRAM).orderBy(
        F.desc("contamination"), "train_doc_id", "eval_doc_id"
    )


QUERIES = {
    "pk1_sequence_packing": pk1_sequence_packing,
    "dc1_decontamination": dc1_decontamination,
}

ORACLE = {
    "pk1_sequence_packing": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                        AS BIGINT) % {PK_SHARDS} AS shard,
                   md5(CAST(doc_id AS VARCHAR)) AS ord_key
            FROM documents
        ),
        c AS (
            SELECT shard, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY ord_key, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(FLOOR(cum_before / {PK_BUDGET}) AS BIGINT) AS seq_id,
               COUNT(1) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
               ROUND(SUM(n_tokens) / {PK_BUDGET}.0, 4) AS fill_ratio,
               SUM(n_tokens) > {PK_BUDGET} AS overflows
        FROM c
        GROUP BY shard, FLOOR(cum_before / {PK_BUDGET})
        ORDER BY shard, seq_id
    """,
    "dc1_decontamination": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   l[g] || ' ' || l[g+1] || ' ' || l[g+2] || ' ' || l[g+3]
                       AS gram
            FROM toks,
                 UNNEST(generate_series(1, greatest(len(l) - 3, 0))) AS t(g)
        ),
        eg AS (
            SELECT doc_id AS eval_doc_id, gram,
                   COUNT(1) OVER (PARTITION BY doc_id) AS eval_ngrams
            FROM grams WHERE doc_id % {DC_EVAL_MOD} = 0
        ),
        tg AS (
            SELECT doc_id AS train_doc_id, gram
            FROM grams WHERE doc_id % {DC_EVAL_MOD} <> 0
        )
        SELECT train_doc_id, eval_doc_id,
               COUNT(1) AS shared_ngrams, eval_ngrams,
               ROUND(COUNT(1) / CAST(eval_ngrams AS DOUBLE), 4)
                   AS contamination
        FROM tg JOIN eg USING (gram)
        GROUP BY train_doc_id, eval_doc_id, eval_ngrams
        ORDER BY contamination DESC, train_doc_id, eval_doc_id
    """,
}
