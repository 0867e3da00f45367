"""Generic archive sources — zip and tar member explosion into rows,
the `sources/warc.py read_warc` shape for corpora distributed as
archives of many small files (the other common delivery container
besides WARC and WebDataset tars; the reference pipeline reads only
loose JSON — `Data_Pipeline_Project_using_Telegram_and_AWS.ipynb`
ingestion cell).

One Python stage (the documented Arrow decode path over binaryFile
bytes), everything after plain columns. Contract, stated:

- one row per archive MEMBER: ``(archive, member, n_bytes, content,
  error)``; directories are skipped (they carry no bytes);
- ``member_pattern`` (a regex) filters on names BEFORE any
  decompression — excluded members cost a central-directory entry
  read, never an inflate (at 100 TB the name filter is the column
  pruning of this source);
- ``max_member_bytes`` is the decompression-bomb guard: a member
  whose DECLARED uncompressed size exceeds the cap lands as an
  ``error`` row without being inflated (the declared size comes from
  the central directory / tar header; a member that LIES — inflates
  past its declaration — is cut off at the cap and errors too);
- torn members (bad CRC, truncated data) land as per-MEMBER error
  rows; an unreadable archive (not a zip/tar at all, torn central
  directory) lands as ONE per-FILE error row — the front-door
  quarantine doctrine throughout;
- tar compression (.tar.gz/.tgz/.tar.bz2/.tar.xz) is handled by
  ``tarfile``'s transparent mode ("r:*").

Memory note: binaryFile materializes each ARCHIVE in one task (the
same bound read_warc and the WebDataset reader carry); shard corpora
into ≤ a few hundred MB per archive, which every real corpus
delivery already does. Members stream one at a time — the cap bounds
the per-member buffer.
"""

from __future__ import annotations

import io
import re
import tarfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

ARCHIVE_SCHEMA_DDL = (
    "archive string, member string, n_bytes long, content binary, "
    "error string"
)

_COLS = [f.split(" ")[0] for f in ARCHIVE_SCHEMA_DDL.split(", ")]


def _bomb_guarded_read(reader, declared: int, cap: int | None):
    """Read one member with the declared-size + lying-stream guard.
    Returns bytes or raises ValueError."""
    if cap is not None and declared > cap:
        raise ValueError(
            f"member declares {declared} bytes > cap {cap}"
        )
    limit = cap if cap is not None else None
    if limit is None:
        return reader.read()
    data = reader.read(limit + 1)
    if len(data) > limit:
        raise ValueError(
            f"member inflates past its declaration (> cap {cap})"
        )
    return data


def _zip_member_rows(path: str, raw: bytes, pattern, cap):
    zf = zipfile.ZipFile(io.BytesIO(raw))  # BadZipFile → per-file row
    for info in zf.infolist():
        if info.is_dir():
            continue
        if pattern is not None and not pattern.search(info.filename):
            continue
        row = {"archive": path, "member": info.filename,
               "n_bytes": None, "content": None, "error": None}
        try:
            with zf.open(info) as f:
                data = _bomb_guarded_read(f, info.file_size, cap)
            row["n_bytes"] = len(data)
            row["content"] = data
        except Exception as e:  # noqa: BLE001 — per-member quarantine
            row["error"] = f"{type(e).__name__}: {e}"[:200]
        yield row


def _tar_member_rows(path: str, raw: bytes, pattern, cap):
    tf = tarfile.open(fileobj=io.BytesIO(raw), mode="r:*")
    for info in tf:
        if not info.isfile():
            continue
        if pattern is not None and not pattern.search(info.name):
            continue
        row = {"archive": path, "member": info.name,
               "n_bytes": None, "content": None, "error": None}
        try:
            f = tf.extractfile(info)
            if f is None:
                raise ValueError("unreadable member")
            data = _bomb_guarded_read(f, info.size, cap)
            row["n_bytes"] = len(data)
            row["content"] = data
        except Exception as e:  # noqa: BLE001 — per-member quarantine
            row["error"] = f"{type(e).__name__}: {e}"[:200]
        yield row


def _make_splitter(kind: str, member_pattern: str | None,
                   max_member_bytes: int | None):
    def split(batches):
        import pandas as pd

        pattern = re.compile(member_pattern) if member_pattern else None
        per_archive = (_zip_member_rows if kind == "zip"
                       else _tar_member_rows)
        for batch in batches:
            out = []
            for path, content in zip(batch["path"], batch["content"]):
                raw = bytes(content)
                # Buffer per archive: the member generators are lazy,
                # so a container that tears MID-iteration (tar header
                # walk raising after members already yielded) must
                # discard the partial rows — the ONE per-file error
                # row is authoritative (module contract).
                rows = []
                try:
                    rows.extend(per_archive(
                        path, raw, pattern, max_member_bytes
                    ))
                except Exception as e:  # noqa: BLE001 — an archive
                    # that cannot be opened (or iterated) is ONE
                    # per-file quarantine row, never a task failure
                    rows = [dict.fromkeys(_COLS) | {
                        "archive": path,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    }]
                out.extend(rows)
            yield pd.DataFrame(out, columns=_COLS)

    return split


def _read_archives(spark, path_glob, kind, member_pattern,
                   max_member_bytes) -> DataFrame:
    binary = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return binary.mapInPandas(
        _make_splitter(kind, member_pattern, max_member_bytes),
        schema=ARCHIVE_SCHEMA_DDL,
    )


def read_zip_archives(
    spark: SparkSession,
    path_glob: str,
    member_pattern: str | None = None,
    max_member_bytes: int | None = None,
) -> DataFrame:
    """Zip archives → one row per member (module contract)."""
    return _read_archives(spark, path_glob, "zip", member_pattern,
                          max_member_bytes)


def read_tar_archives(
    spark: SparkSession,
    path_glob: str,
    member_pattern: str | None = None,
    max_member_bytes: int | None = None,
) -> DataFrame:
    """Tar archives (plain or gz/bz2/xz) → one row per member
    (module contract)."""
    return _read_archives(spark, path_glob, "tar", member_pattern,
                          max_member_bytes)
