"""Archive sources (`sources/archives.py`): zip/tar member explosion
with name-filter pushdown, decompression-bomb caps, per-member and
per-file quarantine; composition with the document front door."""

from __future__ import annotations

import io
import tarfile
import zipfile
import zlib

from data_pipeline_project_using_telegram_and_aws_spark.sources.archives import (
    read_tar_archives,
    read_zip_archives,
)


def _zip_file(path, parts: dict[str, bytes]) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zf.writestr(name, data)


def _tar_file(path, parts: dict[str, bytes], mode="w:gz") -> None:
    with tarfile.open(path, mode) as tf:
        for name, data in parts.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_zip_members_and_quarantine(spark, tmp_path):
    _zip_file(tmp_path / "a.zip", {
        "docs/one.txt": b"first file body",
        "docs/two.txt": b"second",
        "skip/dir/": b"",
    })
    (tmp_path / "broken.zip").write_bytes(b"PK\x03\x04 torn")
    out = read_zip_archives(spark, str(tmp_path) + "/*.zip").collect()
    rows = {(r.archive.rsplit("/", 1)[-1], r.member): r for r in out}
    assert len(out) == 3  # two members + one per-file error row
    assert rows[("a.zip", "docs/one.txt")].n_bytes == 15
    assert bytes(rows[("a.zip", "docs/two.txt")].content) == b"second"
    broken = rows[("broken.zip", None)]
    assert broken.error.startswith("BadZipFile")


def test_zip_member_pattern_filters_before_inflate(spark, tmp_path):
    _zip_file(tmp_path / "a.zip", {
        "keep.md": b"kept",
        "drop.bin": b"\x00" * 100,
    })
    out = read_zip_archives(
        spark, str(tmp_path / "a.zip"), member_pattern=r"\.md$"
    ).collect()
    assert [r.member for r in out] == ["keep.md"]


def test_zip_bomb_caps(spark, tmp_path):
    big = b"\x00" * 100_000  # compresses tiny, declares 100k
    _zip_file(tmp_path / "a.zip", {"bomb.bin": big, "ok.txt": b"tiny"})
    out = {r.member: r for r in read_zip_archives(
        spark, str(tmp_path / "a.zip"), max_member_bytes=1000
    ).collect()}
    assert out["ok.txt"].error is None
    assert "declares 100000 bytes > cap" in out["bomb.bin"].error
    assert out["bomb.bin"].content is None


def test_zip_lying_declaration_cut_off(spark, tmp_path):
    # hand-forge a STORED member whose header declares 4 bytes but
    # carries 64: the declared-size check passes, the read must cut
    raw = io.BytesIO()
    with zipfile.ZipFile(raw, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("liar.bin", b"\x07" * 64)
    blob = bytearray(raw.getvalue())
    # patch uncompressed+compressed size in the local header AND the
    # central directory (offsets per APPNOTE: local 18/22, central 20/24)
    import struct
    crc = zlib.crc32(b"\x07" * 64)
    lh = blob.index(b"PK\x03\x04")
    struct.pack_into("<II", blob, lh + 18, 64, 4)
    cd = blob.index(b"PK\x01\x02")
    struct.pack_into("<II", blob, cd + 20, 64, 4)
    del crc
    p = tmp_path / "liar.zip"
    p.write_bytes(bytes(blob))
    out = read_zip_archives(
        spark, str(p), max_member_bytes=1000
    ).collect()
    # either zipfile itself rejects the inconsistency or the row
    # lands with 4 bytes — both are quarantine-correct; what must
    # NOT happen is a task failure or >cap content
    assert len(out) == 1
    r = out[0]
    assert r.error is not None or r.n_bytes <= 1000


def test_tar_members_gz_and_composition_with_documents(spark, tmp_path):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.documents import (
        extract_documents,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.plans.document_queries import (
        _fixture_docx,
        _fixture_pdf,
    )
    from pyspark.sql import functions as F

    _tar_file(tmp_path / "c.tar.gz", {
        "corpus/a.pdf": _fixture_pdf(),
        "corpus/b.docx": _fixture_docx(),
        "corpus/junk.bin": b"\xde\xad\xbe\xef",
    })
    members = read_tar_archives(spark, str(tmp_path / "c.tar.gz"))
    docs = members.filter(F.col("error").isNull()).select(
        F.abs(F.xxhash64("archive", "member")).alias("doc_id"),
        F.col("content").alias("doc"),
    )
    out = {r.format: r for r in extract_documents(docs).collect()}
    assert out["pdf"].error is None
    assert "Drip brewing, page one." in out["pdf"].text
    assert out["docx"].title == "Q Report"
    assert out["unknown"].error.startswith("ValueError")


def test_tar_tear_mid_iteration_one_error_row(spark, tmp_path):
    """A tar whose member walk raises AFTER yielding valid members
    must land as ONE authoritative per-file error row — the partial
    member rows are discarded (module contract)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("ok.txt")
        info.size = 10
        tf.addfile(info, io.BytesIO(b"0123456789"))
    whole = buf.getvalue()
    # keep member one (header 512 + padded data 512), then append a
    # copy of its header with NO data behind it: iteration yields
    # member one, then tears with ReadError("unexpected end of data")
    # while walking past the phantom member's declared bytes
    torn = whole[:1024] + whole[:512]
    p = tmp_path / "torn.tar"
    p.write_bytes(torn)
    out = read_tar_archives(spark, str(p)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.member is None and r.content is None
    assert r.error is not None  # ReadError: invalid header et al.


def test_tar_bomb_cap(spark, tmp_path):
    _tar_file(tmp_path / "c.tar", {"big.bin": b"\x00" * 50_000},
              mode="w")
    out = read_tar_archives(
        spark, str(tmp_path / "c.tar"), max_member_bytes=100
    ).collect()
    assert len(out) == 1 and "declares 50000" in out[0].error


def test_fuzz_axis21_mutated_archives_quarantine_promptly(spark, tmp_path):
    """Fuzz axis 21: random truncations/byte-flips/splices of zip and
    tar (plain + gz) archives through the REAL distributed sources —
    every mutated FILE must land as at least one row (member rows or
    the per-file error row), per-row error XOR content holds, and no
    mutation hangs or fails the batch. The per-file quarantine
    doctrine under adversarial container bytes."""
    import gzip
    import random

    parts = {"a/one.txt": b"first body text", "b/two.bin": b"\x01" * 64}
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in parts.items():
            zf.writestr(n, d)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        for n, d in parts.items():
            info = tarfile.TarInfo(n)
            info.size = len(d)
            tf.addfile(info, io.BytesIO(d))
    bases = {
        "zip": zbuf.getvalue(),
        "tar": tbuf.getvalue(),
        "tgz": gzip.compress(tbuf.getvalue(), mtime=0),
    }
    rng = random.Random(21)
    counts = {}
    for kind, base in bases.items():
        d = tmp_path / kind
        d.mkdir()
        n_files = 0
        for trial in range(12):
            raw = bytearray(base)
            m = trial % 3
            if m == 0 and len(raw) > 2:
                raw = raw[:rng.randrange(1, len(raw))]
            elif m == 1:
                for _ in range(rng.randrange(1, 5)):
                    raw[rng.randrange(len(raw))] = rng.randrange(256)
            else:
                i = rng.randrange(len(raw))
                j = rng.randrange(len(raw))
                raw[i:i + 12] = raw[j:j + 12]
            ext = "zip" if kind == "zip" else (
                "tar" if kind == "tar" else "tar.gz")
            (d / f"m{trial}.{ext}").write_bytes(bytes(raw))
            n_files += 1
        counts[kind] = n_files

    for kind, reader in (("zip", read_zip_archives),
                         ("tar", read_tar_archives),
                         ("tgz", read_tar_archives)):
        glob = str(tmp_path / kind) + "/*"
        out = reader(spark, glob, max_member_bytes=10_000).collect()
        archives = {r.archive for r in out}
        assert len(archives) == counts[kind], (kind, len(archives))
        for r in out:  # quarantine XOR payload, never both/neither
            if r.error is not None:
                assert r.content is None
            else:
                assert r.content is not None and r.n_bytes >= 0
