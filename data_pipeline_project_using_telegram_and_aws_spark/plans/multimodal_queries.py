"""Multimodal-column queries. The testdata has no real media bytes, so the
``documents.text`` payload stands in as the opaque binary column — the
plumbing (binary type, metadata extraction, mapInPandas decode stage) is
exactly what real media would use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import attach_media_metadata, extract_media_features
from ..sources.tables import load_table


def _media_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("media"),
        F.lit("text/plain").alias("media_type"),
    )


def mm1_binary_metadata(spark, sf_dir):
    """JVM-side metadata over an opaque binary column: byte size + content
    hash per media object, aggregated by type."""
    media = attach_media_metadata(_media_df(spark, sf_dir))
    return media.select(
        "media_id",
        "media_type",
        F.col("media_n_bytes").alias("n_bytes"),
        F.col("media_hash").alias("content_hash"),
    ).orderBy("media_id")


def mm2_decode_features(spark, sf_dir):
    """Distributed (fake) decode via mapInPandas → typed feature rows.
    No SQL oracle: the decode stage is the explicitly stubbed non-SQL
    surface; determinism is asserted by unit tests instead."""
    media = _media_df(spark, sf_dir)
    feats = extract_media_features(media, fake=True, partitions=8)
    return feats.select(
        "media_id", "n_bytes", "content_hash", "width", "height", "n_frames"
    ).orderBy("media_id")


QUERIES = {
    "mm1_binary_metadata": mm1_binary_metadata,
    "mm2_decode_features": mm2_decode_features,
}

ORACLE = {
    "mm1_binary_metadata": """
        SELECT doc_id AS media_id,
               'text/plain' AS media_type,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents
        ORDER BY media_id
    """,
    # mm2_decode_features: intentionally no oracle — the decode is the
    # stubbed non-SQL-expressible stage (rows-only check).
}
