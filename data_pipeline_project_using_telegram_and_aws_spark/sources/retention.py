"""Partition retention: expire day-partitions (or any partition
column) past a cutoff — the lifecycle op every partitioned lake needs
and Spark leaves to the filesystem.

Deliberately small and explicit:

- the unit of deletion is a PARTITION DIRECTORY (the same atomicity
  unit every writer in this repo appends by), never individual files;
- the cutoff compares typed values, not directory-name strings: values
  parse as int when every partition parses as int, else compare as
  strings (ISO dates sort correctly either way) — a mixed/unparseable
  directory fails loudly instead of being silently kept or dropped;
- ``dry_run=True`` returns the same report without touching disk —
  run it first, alert on surprises (the `etl_job` empty-input lesson:
  destructive defaults hide mistakes);
- the report (one row per expired partition, with file counts) is the
  audit artifact; log it with the run.
"""

from __future__ import annotations

import shutil
from pathlib import Path


def list_partitions(path: str, partition_col: str) -> list[str]:
    """Raw partition values present on disk, sorted."""
    prefix = f"{partition_col}="
    root = Path(path)
    if not root.exists():
        raise FileNotFoundError(f"list_partitions: {path} does not exist")
    vals = sorted(
        d.name[len(prefix):]
        for d in root.iterdir()
        if d.is_dir() and d.name.startswith(prefix)
    )
    if not vals:
        raise ValueError(
            f"list_partitions: no {prefix}* directories under {path}"
        )
    return vals


def expire_partitions(
    path: str,
    partition_col: str,
    cutoff,
    dry_run: bool = False,
) -> list[dict]:
    """Delete every partition with value < ``cutoff``; returns one
    ``{"value", "n_files", "deleted"}`` dict per expired partition
    (``deleted`` False on dry runs). Values and cutoff are compared as
    ints when every partition value parses as int, else as strings."""
    vals = list_partitions(path, partition_col)
    try:
        typed = [(v, int(v)) for v in vals]
        cut = int(cutoff)
    except ValueError:
        typed = [(v, v) for v in vals]
        cut = str(cutoff)
    report = []
    for raw, val in typed:
        if val < cut:
            d = Path(path) / f"{partition_col}={raw}"
            n_files = sum(1 for f in d.rglob("*") if f.is_file())
            if not dry_run:
                shutil.rmtree(d)
            report.append(
                {"value": raw, "n_files": n_files, "deleted": not dry_run}
            )
    return report
