"""The documents recipe end-to-end: a mixed-format archive through
the WHOLE chain — archive source → unified front door → markup/
subtitle/latex resolution → curation (dedup + quality + ledger) →
sequence packing. Every stage is the real operator; the final packed
corpus and the drop ledger are both pinned."""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
    curate_corpus,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.documents import (
    document_plain_text,
    extract_documents,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
    materialize_sequences,
    pack_sequences,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans.document_queries import (
    _SRT_SOURCE,
    _TEX_SOURCE,
    _fixture_docx,
    _fixture_epub,
    _fixture_pdf,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.archives import (
    read_zip_archives,
)


def test_documents_recipe_end_to_end(spark, tmp_path):
    members = {
        "corpus/report.pdf": _fixture_pdf(),
        "corpus/report2.pdf": _fixture_pdf(),      # exact duplicate
        "corpus/q.docx": _fixture_docx(),
        "corpus/book.epub": _fixture_epub(),
        "corpus/paper.tex": _TEX_SOURCE.encode(),
        "corpus/talk.srt": _SRT_SOURCE.encode(),
        "corpus/broken.bin": b"\x00\x01 not a document",
        "corpus/locked.epub": _fixture_epub(encrypted=True),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    p = tmp_path / "corpus.zip"
    p.write_bytes(buf.getvalue())

    # 1. archive source: one row per member
    rows = read_zip_archives(spark, str(p))
    assert rows.count() == len(members)

    # 2-3. front door + resolution; stable ids from member names
    docs = rows.select(
        F.abs(F.xxhash64("member")).alias("doc_id"),
        F.col("member"),
        F.col("content").alias("doc"),
    )
    extracted = document_plain_text(
        extract_documents(docs, doc_col="doc")
    )
    id_to_member = {r.doc_id: r.member for r in docs.collect()}
    by_member = {
        id_to_member[r.doc_id]: r for r in extracted.collect()
    }
    # quarantine: the two unopenable members, with reasons
    assert by_member["corpus/broken.bin"].error is not None
    assert "encrypted epub" in by_member["corpus/locked.epub"].error
    good = extracted.filter(F.col("error").isNull())
    assert good.count() == 6

    # 4. curation over the resolved text: the duplicate pdf dies at
    # exact_dedup, everything else survives
    kept, ledger = curate_corpus(
        good.select("doc_id", F.col("plain_text").alias("text")),
        min_tokens=3,
    )
    kept_members = {id_to_member[r.doc_id] for r in kept.collect()}
    assert len(kept_members) == 5
    assert {"corpus/q.docx", "corpus/book.epub", "corpus/paper.tex",
            "corpus/talk.srt"} <= kept_members
    assert len(kept_members & {"corpus/report.pdf",
                               "corpus/report2.pdf"}) == 1
    drops = {(id_to_member[r.doc_id], r.stage) for r in ledger.collect()}
    assert len(drops) == 1 and next(iter(drops))[1] == "exact_dedup"

    # 5. packing: every kept document lands in exactly one sequence
    packed = pack_sequences(kept, budget=64, n_shards=2)
    seqs = materialize_sequences(packed)
    total_docs = seqs.agg(F.sum("n_docs")).collect()[0][0]
    assert total_docs == 5
    texts = " ".join(r.seq_text for r in seqs.collect())
    assert "Drip brewing, page one." in texts
    assert "Quarterly report overview." in texts
    assert "Hello from cue one." in texts
