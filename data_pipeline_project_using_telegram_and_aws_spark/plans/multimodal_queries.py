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
    The real decode (PIL/ffmpeg) is the stubbed non-SQL stage, but the
    deterministic fake decoder is intentionally md5-derived so even the
    Arrow/mapInPandas plumbing is oracle-checked end-to-end — the SQL
    twin reparses the md5 hex digits the Python worker hashes.

    Also carries the JVM-side metadata surface that was row mm1 through
    round 3 (registry consolidation): ``media_type`` plus two booleans
    asserting the JVM metadata path (attach_media_metadata: length +
    md5, no Python) agrees byte-for-byte with the Python decoder's
    n_bytes and content_hash. The oracle pins the booleans TRUE — the
    q31/q37 pattern: the engine checks its own cross-path consistency
    and only the deterministic boolean is hashed, so any JVM-vs-Python
    divergence turns the row red. ``mm1_binary_metadata`` stays callable
    and pytest-covered."""
    media = _media_df(spark, sf_dir)
    meta = attach_media_metadata(media).select(
        "media_id",
        "media_type",
        F.col("media_n_bytes").alias("__jvm_bytes"),
        F.col("media_hash").alias("__jvm_hash"),
    )
    feats = extract_media_features(media, fake=True, partitions=8)
    return (
        feats.join(meta, "media_id")
        .select(
            "media_id",
            "media_type",
            "n_bytes",
            "content_hash",
            (F.col("__jvm_bytes") == F.col("n_bytes")).alias(
                "jvm_python_bytes_agree"
            ),
            (F.col("__jvm_hash") == F.col("content_hash")).alias(
                "jvm_python_hash_agree"
            ),
            "width",
            "height",
            "n_frames",
        )
        .orderBy("media_id")
    )


QUERIES = {
    # mm1_binary_metadata left the 50-row registry in round 4: its JVM
    # metadata surface is hash-checked inside mm2 (media_type + the two
    # cross-path agreement booleans); still callable and pinned by
    # tests/test_registry_consolidation.py.
    "mm2_decode_features": mm2_decode_features,
}

ORACLE = {
    # hex-pair -> byte value, mirroring digest[i] in the Python decoder
    "mm2_decode_features": """
        WITH h AS (
            SELECT doc_id AS media_id,
                   md5(text) AS hex,
                   octet_length(CAST(text AS BLOB)) AS nb
            FROM documents
        ),
        b AS (
            SELECT media_id, hex, nb,
                   16 * (strpos('0123456789abcdef', substr(hex, 1, 1)) - 1)
                     + (strpos('0123456789abcdef', substr(hex, 2, 1)) - 1)
                       AS byte0,
                   16 * (strpos('0123456789abcdef', substr(hex, 3, 1)) - 1)
                     + (strpos('0123456789abcdef', substr(hex, 4, 1)) - 1)
                       AS byte1
            FROM h
        )
        SELECT media_id,
               'text/plain' AS media_type,
               CAST(nb AS BIGINT) AS n_bytes,
               hex AS content_hash,
               TRUE AS jvm_python_bytes_agree,
               TRUE AS jvm_python_hash_agree,
               CAST(16 + byte0 % 64 AS INTEGER) AS width,
               CAST(16 + byte1 % 64 AS INTEGER) AS height,
               CAST(1 + nb % 8 AS INTEGER) AS n_frames
        FROM b
        ORDER BY media_id
    """,
}
