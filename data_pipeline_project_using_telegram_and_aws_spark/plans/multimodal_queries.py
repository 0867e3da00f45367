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


# Fixed REAL container bytes (hex), embedded so the driver row checks
# the REAL decoders (operators/media_codecs + operators/jpeg), not only
# the md5-derived fake: a flat 3x2 PPM, a flat 5x4 PNG (zlib stream
# frozen here as bytes, not re-encoded, so the md5 is a stable
# constant), a 2-frame 3x3 GIF (own-LZW path + the 1-to-N frame-count
# metadata), and the 331-byte jpeg produced by REAL libjpeg that ships
# with this environment's IPython test fixtures (baseline, standard
# Annex-K tables). Expected width/height/n_frames are CONSTRUCTION
# constants, not decoder echoes; the md5s below are computed by Python
# hashlib at authoring time (the JVM re-derives them at run time — a
# third implementation agreeing).
_REAL_FIXTURES = [
    # (media_id, media_type, hex, n_bytes, md5, width, height, n_frames)
    (9000001, "image/x-portable-pixmap",
     "50360a3320320a3235350a0a82fa0a82fa0a82fa0a82fa0a82fa0a82fa",
     29, "9c08ad28c64b3e2864d36ad26f00366d", 3, 2, 1),
    (9000002, "image/png",
     "89504e470d0a1a0a0000000d4948445200000005000000040802000000c9516217"
     "0000001149444154789c63386194828c1848e40300733d1b59388f670d00000000"
     "49454e44ae426082",
     74, "c86866b9e252bc1d3faeb0334e91fccc", 5, 4, 1),
    (9000003, "image/gif",
     "4749463839610300030082000000000001020302040603060904080c050a0f060c"
     "12070e1521f90400000000002c000000000300030000030a282828282828282828"
     "090021f90400000000002c000000000300030000030a5858585858585858580900"
     "3b",
     100, "26ec25c00304a3eda955546321ccaefb", 3, 3, 2),
    (9000004, "image/jpeg",
     "ffd8ffe000104a46494600010100000100010000ffdb00430008060607060508070"
     "7070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c23"
     "1c1c2837292c30313434341f27393d38323c2e333432ffc0000b0800020002010111"
     "00ffc4001f0000010501010101010100000000000000000102030405060708090a0b"
     "ffc400b5100002010303020403050504040000017d0102030004110512213141061351"
     "6107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728"
     "292a3435363738393a434445464748494a535455565758595a636465666768696a73"
     "7475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2"
     "b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8"
     "e9eaf1f2f3f4f5f6f7f8f9faffda0008010100003f002bffd9",
     331, "0dfb62cd080fc2ad9c8204c805e68ce8", 2, 2, 1),
]

# Fixed REAL VIDEO container bytes (round 11): a 2-frame 4x2 C420 Y4M
# (solid red / solid green via BT.601 — construction constants pinned
# by tests/test_video.py's scalar conversion) and a 330-byte MJPG AVI
# whose single 8x8 frame OMITS its Huffman tables — so this driver row
# exercises the Annex K DHT-splice path (`operators/video.py
# _ensure_jpeg_tables`) plus the RIFF walk and the shared JPEG
# decoder. Bytes built by the INDEPENDENT test encoders
# (tests/test_video.py builders) at authoring time and frozen as hex;
# md5/n_bytes are authoring-time hashlib literals, dimensions and
# frame counts construction constants.
_REAL_VIDEO_FIXTURES = [
    # (media_id, media_type, hex, n_bytes, md5, width, height, n_frames)
    (9000005, "video/x-yuv4mpeg",
     "595556344d50454732205734204832204633303a312049702041313a31204334"
     "32306a7065670a4652414d450a51515151515151515a5af0f04652414d450a91"
     "9191919191919136362222",
     75, "0ced133b997720d65bf8e098998c438a", 4, 2, 2),
    (9000006, "video/x-msvideo",
     "5249464642010000415649204c495354c00000006864726c6176696838000000"
     "409c000000000000000000000000000001000000000000000100000000000000"
     "0800000008000000000000000000000000000000000000004c49535474000000"
     "7374726c7374726838000000766964734d4a5047000000000000000000000000"
     "0100000019000000000000000100000000000000000000000000000000000000"
     "000000007374726628000000280000000800000008000000010018004d4a5047"
     "00000000000000000000000000000000000000004c4953546e0000006d6f7669"
     "3030646362000000ffd8ffdb0043001010101010101010101010101010101010"
     "1010101010101010101010101010101010101010101010101010101010101010"
     "101010101010101010101010101010ffc0000b080008000801011100ffda0008"
     "010100003f00b15fffd9",
     330, "369abe3364b5365cb58140cabddd189a", 8, 8, 1),
]


def mm2_decode_features(spark, sf_dir):
    """Distributed decode via mapInPandas → typed feature rows, TWO
    decode paths in one hash-checked row since round 10:

    - the sf_dir documents run the deterministic md5-derived FAKE
      decoder, so the Arrow/mapInPandas plumbing is oracle-checked
      end-to-end at corpus scale (the SQL twin reparses the md5 hex
      digits the Python worker hashes);
    - four fixed REAL containers (``_REAL_FIXTURES``: PPM, PNG,
      2-frame GIF, and a REAL-libjpeg baseline JPEG) run the REAL
      decoders (`operators/media_codecs.numpy_image_decoder` →
      `operators/jpeg.py` et al.); the oracle pins their
      width/height/n_frames as CONSTRUCTION constants and their
      n_bytes/md5 as authoring-time literals — a broken real decoder
      turns the driver row red, closing the r9 gap where the real
      decode path was pytest-only;
    - two fixed REAL VIDEO containers (``_REAL_VIDEO_FIXTURES``,
      round 11: a 2-frame C420 Y4M and a DHT-less MJPG AVI) run
      `operators/video.py numpy_video_decoder` — RIFF/Y4M container
      walks, BT.601 conversion, and the Annex K Huffman-splice path
      all turn this row red on break.

    Also carries the JVM-side metadata surface that was row mm1 through
    round 3 (registry consolidation): ``media_type`` plus two booleans
    asserting the JVM metadata path (attach_media_metadata: length +
    md5, no Python) agrees byte-for-byte with the Python decoder's
    n_bytes and content_hash. The oracle pins the booleans TRUE — the
    q31/q37 pattern: the engine checks its own cross-path consistency
    and only the deterministic boolean is hashed, so any JVM-vs-Python
    divergence turns the row red. ``mm1_binary_metadata`` stays callable
    and pytest-covered."""
    from ..operators.media_codecs import numpy_image_decoder
    from ..operators.video import numpy_video_decoder

    docs_media = _media_df(spark, sf_dir)
    real_media = spark.createDataFrame(
        [
            (i, bytearray(bytes.fromhex(h)), t)
            for i, t, h, *_ in _REAL_FIXTURES
        ],
        "media_id long, media binary, media_type string",
    )
    video_media = spark.createDataFrame(
        [
            (i, bytearray(bytes.fromhex(h)), t)
            for i, t, h, *_ in _REAL_VIDEO_FIXTURES
        ],
        "media_id long, media binary, media_type string",
    )
    media = docs_media.unionByName(real_media).unionByName(video_media)
    meta = attach_media_metadata(media).select(
        "media_id",
        "media_type",
        F.col("media_n_bytes").alias("__jvm_bytes"),
        F.col("media_hash").alias("__jvm_hash"),
    )
    feats = extract_media_features(
        docs_media, fake=True, partitions=8
    ).unionByName(
        extract_media_features(real_media, decoder=numpy_image_decoder)
    ).unionByName(
        extract_media_features(video_media, decoder=numpy_video_decoder)
    )
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
        UNION ALL
        SELECT * FROM (VALUES
            (CAST(9000001 AS BIGINT), 'image/x-portable-pixmap', CAST(29 AS BIGINT), '9c08ad28c64b3e2864d36ad26f00366d', TRUE, TRUE, CAST(3 AS INTEGER), CAST(2 AS INTEGER), CAST(1 AS INTEGER)),
            (CAST(9000002 AS BIGINT), 'image/png', CAST(74 AS BIGINT), 'c86866b9e252bc1d3faeb0334e91fccc', TRUE, TRUE, CAST(5 AS INTEGER), CAST(4 AS INTEGER), CAST(1 AS INTEGER)),
            (CAST(9000003 AS BIGINT), 'image/gif', CAST(100 AS BIGINT), '26ec25c00304a3eda955546321ccaefb', TRUE, TRUE, CAST(3 AS INTEGER), CAST(3 AS INTEGER), CAST(2 AS INTEGER)),
            (CAST(9000004 AS BIGINT), 'image/jpeg', CAST(331 AS BIGINT), '0dfb62cd080fc2ad9c8204c805e68ce8', TRUE, TRUE, CAST(2 AS INTEGER), CAST(2 AS INTEGER), CAST(1 AS INTEGER)),
            (CAST(9000005 AS BIGINT), 'video/x-yuv4mpeg', CAST(75 AS BIGINT), '0ced133b997720d65bf8e098998c438a', TRUE, TRUE, CAST(4 AS INTEGER), CAST(2 AS INTEGER), CAST(2 AS INTEGER)),
            (CAST(9000006 AS BIGINT), 'video/x-msvideo', CAST(330 AS BIGINT), '369abe3364b5365cb58140cabddd189a', TRUE, TRUE, CAST(8 AS INTEGER), CAST(8 AS INTEGER), CAST(1 AS INTEGER))
        ) AS real_fixtures(media_id, media_type, n_bytes, content_hash,
                           jvm_python_bytes_agree, jvm_python_hash_agree,
                           width, height, n_frames)
        ORDER BY media_id
    """,
}
