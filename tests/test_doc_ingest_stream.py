"""Streaming document front door (streaming/doc_ingest.py):
unopenable containers → quarantine with the extractor's reason,
thin/low-confidence extractions → reject with auditable stats, real
documents → good zone with bytes + text + metadata; zones PARTITION
the input per batch; checkpoint resume processes only new files; the
good zone feeds the text chain (curation) end-to-end."""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.plans.document_queries import (
    _fixture_docx,
    _fixture_epub,
    _fixture_pdf,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.doc_ingest import (
    start_document_ingest_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("doc", T.BinaryType()),
    ]
)


def _thin_docx() -> bytes:
    # extracts fine but carries almost no text -> reject (min_chars)
    import io
    import zipfile

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{w}">'
           f"<w:body><w:p><w:r><w:t>hi</w:t></w:r></w:p>"
           f"</w:body></w:document>").encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def test_document_front_door_zones_and_resume(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    ck = str(tmp_path / "ck")
    rows = [
        (1, bytearray(_fixture_pdf())),                  # good
        (2, bytearray(_fixture_docx())),                 # good
        (3, bytearray(_fixture_epub())),                 # good (markup
                                                         #  resolved)
        (4, bytearray(_thin_docx())),                    # reject
        (5, bytearray(b"GIF89a not a document")),        # quarantine
        (6, bytearray(_fixture_epub(encrypted=True))),   # quarantine
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_document_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck,
        min_chars=30,
    ).awaitTermination(180)

    g = {r.doc_id: r for r in spark.read.parquet(good).collect()}
    rj = {r.doc_id: r for r in spark.read.parquet(reject).collect()}
    q = {r.doc_id: r for r in spark.read.parquet(quar).collect()}
    assert set(g) == {1, 2, 3} and set(rj) == {4} and set(q) == {5, 6}
    assert len(g) + len(rj) + len(q) == len(rows)  # conservation
    # good rows keep original bytes AND the extracted product
    assert bytes(g[1].doc) == bytes(_fixture_pdf())
    assert g[1].title == "Fixture PDF" and g[1].n_units == 2
    assert "Drip brewing, page one." in g[1].plain_text
    # the EPUB row landed RESOLVED (no markup in the good zone)
    assert "Chapter one" in g[3].plain_text and "<p>" not in g[3].plain_text
    assert g[3].format == "epub" and g[3].language == "en"
    # reject rows carry the auditable stats that failed the gate
    assert rj[4].n_chars == 2 and rj[4].format == "docx"
    # quarantine reasons quote the extractor
    assert "unsupported container" in q[5].reason
    assert "encrypted epub" in q[6].reason

    # checkpoint resume: a second file lands; only IT is processed,
    # and prior zone partitions survive untouched
    spark.createDataFrame(
        [(7, bytearray(_fixture_docx())), (8, bytearray(b"junk"))],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_document_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck,
        min_chars=30,
    ).awaitTermination(180)
    g2 = {r.doc_id for r in spark.read.parquet(good).collect()}
    q2 = {r.doc_id for r in spark.read.parquet(quar).collect()}
    assert g2 == {1, 2, 3, 7} and q2 == {5, 6, 8}


def test_degenerate_ids_quarantined_invariant_holds(spark, tmp_path):
    """NULL and duplicated doc_id rows land in quarantine with a
    'bad doc_id' reason instead of being dropped (NULL never matches
    the join-back) or fanned out (duplicate join multiplies rows):
    |batch| = |quarantine| + |reject| + |good| exactly."""
    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar, ck = (
        str(tmp_path / z) for z in ("good", "reject", "quar", "ck")
    )
    rows = [
        (1, bytearray(_fixture_docx())),    # good
        (None, bytearray(_fixture_pdf())),  # quarantine: null id
        (7, bytearray(_fixture_pdf())),     # quarantine: dup id
        (7, bytearray(_fixture_docx())),    # quarantine: dup id
        (8, bytearray(b"junk")),            # quarantine: bad container
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_document_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck,
        min_chars=30,
    ).awaitTermination(180)
    from pyspark.errors.exceptions.captured import AnalysisException

    g = spark.read.parquet(good).collect()
    try:  # an all-pass batch writes an EMPTY reject zone (no files)
        rj = spark.read.parquet(reject).collect()
    except AnalysisException:
        rj = []
    q = spark.read.parquet(quar).collect()
    assert len(g) + len(rj) + len(q) == len(rows)  # exact partition
    assert {r.doc_id for r in g} == {1} and not rj
    reasons = {(r.doc_id, r.reason.split(":")[0]) for r in q}
    assert (None, "bad doc_id") in reasons
    assert sum(1 for r in q if r.doc_id == 7
               and "duplicated" in r.reason) == 2
    assert sum(1 for r in q if r.doc_id == 8) == 1
    # degenerate rows still carry their bytes (re-runnable)
    assert all(r.doc is not None for r in q)


def test_good_zone_feeds_curation(spark, tmp_path):
    """The front door's good zone is a documents-table-shaped input:
    plain_text renames to text and the EXISTING curation chain runs
    unchanged — extraction to curated corpus end-to-end."""
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
        curate_corpus,
    )

    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar, ck = (
        str(tmp_path / z) for z in ("good", "reject", "quar", "ck")
    )
    rows = [
        (1, bytearray(_fixture_pdf())),
        (2, bytearray(_fixture_docx())),
        (3, bytearray(_fixture_pdf())),  # byte-identical to 1 -> dedup
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_document_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck,
        min_chars=30,
    ).awaitTermination(180)
    docs = spark.read.parquet(good).select(
        "doc_id", F.col("plain_text").alias("text")
    )
    kept, ledger = curate_corpus(docs, min_tokens=3)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # the duplicate extraction dies at exact-dedup (keep-first)
    assert ids == {1, 2}
    dropped = {(r.doc_id, r.stage) for r in ledger.collect()}
    assert dropped == {(3, "exact_dedup")}
