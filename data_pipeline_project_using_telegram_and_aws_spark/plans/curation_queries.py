"""Corpus-curation query: the end-to-end training-data cleaning pipeline
(operators/curation.py) run over ``documents``, verified through its DROP
LEDGER — the auditable record of which document each stage removed and
why. The DuckDB oracle reproduces every stage: exact-dedup ranking,
MinHash-LSH near-dup candidates over the survivors, the quality CASE
ladder, and the language allow-list.
"""

from __future__ import annotations

from ..operators.curation import curate_corpus
from ..sources.tables import load_table

# pipeline parameters pinned for the oracle-checked run
JACCARD_THRESHOLD = 0.3
MIN_TOKENS = 15
MAX_TOKENS = 100_000
MAX_PUNCT_RATIO = 0.3
KEEP_LANGS = ["de", "en", "es", "fr"]  # drops zh on the synthetic corpus


def cu1_corpus_curation(spark, sf_dir):
    """Drop ledger of the full curation pipeline (doc_id, stage, reason,
    kept_alive), one row per removed document, ordered by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    _kept, ledger = curate_corpus(
        docs,
        jaccard_threshold=JACCARD_THRESHOLD,
        min_tokens=MIN_TOKENS,
        max_tokens=MAX_TOKENS,
        max_punct_ratio=MAX_PUNCT_RATIO,
        keep_langs=KEEP_LANGS,
    )
    return ledger.orderBy("doc_id")


QUERIES = {"cu1_corpus_curation": cu1_corpus_curation}

_LANG_SQL = "('" + "','".join(KEEP_LANGS) + "')"

ORACLE = {
    "cu1_corpus_curation": f"""
        WITH ranked AS (
            SELECT doc_id, text, lang, md5(text) AS h,
                   ROW_NUMBER() OVER (
                       PARTITION BY md5(text) ORDER BY doc_id
                   ) AS rn
            FROM documents
        ),
        exact_drops AS (
            SELECT doc_id, 'exact_dedup' AS stage,
                   'duplicate text_hash=' || h AS reason
            FROM ranked WHERE rn > 1
        ),
        s1 AS (SELECT doc_id, text, lang FROM ranked WHERE rn = 1),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM s1
        ),
        shingle_rows AS (
            SELECT DISTINCT doc_id,
                   l[g] || ' ' || l[g+1] || ' ' || l[g+2] AS shingle
            FROM toks,
                 UNNEST(generate_series(1, greatest(len(l) - 2, 0))) AS t(g)
        ),
        sigs AS (
            SELECT doc_id, salt,
                   MIN(md5(CAST(salt AS VARCHAR) || '|' || shingle)) AS minhash
            FROM shingle_rows, UNNEST(generate_series(0, 15)) AS s(salt)
            GROUP BY doc_id, salt
        ),
        bands AS (
            SELECT doc_id, CAST(salt // 2 AS INT) AS band,
                   md5(string_agg(lpad(CAST(salt AS VARCHAR), 4, '0')
                                  || ':' || minhash, ','
                                  ORDER BY lpad(CAST(salt AS VARCHAR), 4, '0')
                                           || ':' || minhash)) AS bucket
            FROM sigs
            GROUP BY doc_id, band
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b USING (band, bucket)
            WHERE a.doc_id < b.doc_id
        ),
        est AS (
            SELECT doc_a, doc_b,
                   ROUND(SUM(CASE WHEN sa.minhash = sb.minhash
                                  THEN 1 ELSE 0 END) / 16.0, 4) AS ej
            FROM cand
            JOIN sigs sa ON sa.doc_id = doc_a
            JOIN sigs sb ON sb.doc_id = doc_b AND sb.salt = sa.salt
            GROUP BY doc_a, doc_b
        ),
        near_base AS (
            SELECT doc_b AS doc_id, MIN(doc_a) AS kept, MAX(ej) AS ej
            FROM est
            WHERE ej >= {JACCARD_THRESHOLD}
            GROUP BY doc_b
        ),
        near_drops AS (
            SELECT doc_id, 'near_dedup' AS stage,
                   'minhash est_jaccard='
                   || CAST(CAST(ej AS DECIMAL(6,4)) AS VARCHAR)
                   || ' vs doc ' || CAST(kept AS VARCHAR) AS reason,
                   kept NOT IN (SELECT doc_id FROM near_base) AS kept_alive
            FROM near_base
        ),
        s2 AS (
            SELECT * FROM s1
            WHERE doc_id NOT IN (SELECT doc_id FROM near_drops)
        ),
        graded AS (
            SELECT doc_id, lang,
                   CASE WHEN len(list_filter(string_split(text, ' '),
                                             x -> x <> '')) < {MIN_TOKENS}
                            THEN 'too_short'
                        WHEN len(list_filter(string_split(text, ' '),
                                             x -> x <> '')) > {MAX_TOKENS}
                            THEN 'too_long'
                        WHEN LENGTH(regexp_replace(text, '[^!?.,;:]', '', 'g'))
                             / greatest(LENGTH(text), 1) > {MAX_PUNCT_RATIO}
                            THEN 'punct_ratio'
                   END AS q_reason
            FROM s2
        ),
        quality_drops AS (
            SELECT doc_id, 'quality' AS stage, q_reason AS reason
            FROM graded WHERE q_reason IS NOT NULL
        ),
        lang_drops AS (
            SELECT doc_id, 'language' AS stage, 'lang=' || lang AS reason
            FROM graded
            WHERE q_reason IS NULL AND lang NOT IN {_LANG_SQL}
        )
        SELECT doc_id, stage, reason, CAST(NULL AS BOOLEAN) AS kept_alive
        FROM exact_drops
        UNION ALL SELECT doc_id, stage, reason, kept_alive FROM near_drops
        UNION ALL SELECT doc_id, stage, reason, CAST(NULL AS BOOLEAN)
        FROM quality_drops
        UNION ALL SELECT doc_id, stage, reason, CAST(NULL AS BOOLEAN)
        FROM lang_drops
        ORDER BY doc_id
    """,
}
