"""Crash-consistent ledger compaction: the commit protocol every
parquet ledger in this repo (`sketch_ledger`, `stat_ledgers`, the
heavy-hitter candidate store) uses to fold old ``ingest_batch``
partitions into an ``ingest_batch = -1`` baseline WITHOUT a
double-count window.

The hazard this closes (the "two non-atomic steps" bug): writing the
folded baseline and deleting the folded partitions are separate
filesystem operations. A crash between them leaves the folded mass in
BOTH the baseline and the surviving batch partitions; for ledgers
whose merge is a SUM (count-min counters, every ledger's ``n_rows``)
the next merge silently double-counts — forever. Set-union ledgers
(quantile samples, HLL registers, candidate sets) keep a correct
ESTIMATE but still inflate their exact counters.

The protocol — one atomic commit point, everything else recoverable:

1. Build the new baseline from the CURRENT readable state (prior
   baseline ∪ not-yet-folded partitions ≤ ``through_batch``) and
   write it, plus a ``_compacted_through`` marker file naming
   ``through_batch``, into a dot-prefixed staging dir Spark's file
   listing ignores.
2. Swap the staging dir onto ``ingest_batch=-1`` with directory
   renames (old baseline → trash, staging → baseline). The rename of
   staging onto the live name is the COMMIT POINT: baseline rows and
   marker become visible together or not at all.
3. Only then delete the folded batch partitions — at leisure, because
   every reader goes through :func:`read_ledger`, which EXCLUDES
   non-baseline partitions ``0 <= ingest_batch <= marker``. A crash
   anywhere in step 3 (or between 2 and 3) leaves stale partitions
   that no reader sums.

Crash recovery (:func:`recover_compaction`, run by every read and
every compaction) resolves the remaining windows by inspection:
staging present → the commit never happened, discard it; baseline
missing but trash present → the swap died between its two renames,
roll the trash back. Both recoveries restore the exact pre-compaction
answer. The directory renames carry the same POSIX-atomicity
assumption every swap in this repo states (`sources/lake.py` — on an
object store, replace the rename pair with a manifest-pointer update,
the Iceberg/Delta commit model).

Replay interaction unchanged: the maintenance-window contract (compact
only with the stream stopped and the checkpoint committed past
``through_batch``) still governs at-least-once RE-DELIVERY of a folded
batch id; this module is about crash consistency of the compaction
itself, which previously could corrupt totals even under a perfectly
quiesced stream.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

BASELINE_DIR = "ingest_batch=-1"
MARKER_FILE = "_compacted_through"  # underscore ⇒ hidden from Spark
_STAGING_DIR = ".compact_staging"  # dot ⇒ hidden from Spark
_TRASH_DIR = ".compact_trash"

# indirection points so crash-injection tests can kill the process
# "between steps" by monkeypatching
_rmtree = shutil.rmtree
_rename = Path.rename


def recover_compaction(ledger_path: str) -> None:
    """Resolve any half-finished compaction under ``ledger_path`` to a
    consistent state (pre- or post-commit, whichever the crash left
    committed). Idempotent; every reader and compactor calls it."""
    root = Path(ledger_path)
    base, staging, trash = (
        root / BASELINE_DIR,
        root / _STAGING_DIR,
        root / _TRASH_DIR,
    )
    if not base.exists() and trash.exists():
        # died between the swap's two renames: roll the old baseline
        # back; the staged one was never committed
        _rename(trash, base)
    if staging.exists():
        _rmtree(staging)
    if trash.exists():
        _rmtree(trash)


def compacted_through(ledger_path: str) -> int | None:
    """The committed compaction horizon, or None if never compacted.
    Meaning: every non-baseline partition with ``ingest_batch <= this``
    is already folded into the baseline and must not be summed."""
    marker = Path(ledger_path) / BASELINE_DIR / MARKER_FILE
    if not marker.exists():
        return None
    return int(marker.read_text().strip())


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    """THE read path for a compactable ledger: recover, then return
    the ledger with already-folded partitions excluded. The filter is
    on the partition column, so it prunes at the scan — stale folded
    partitions (a crash mid-delete) cost nothing and count nothing."""
    recover_compaction(ledger_path)
    df = spark.read.parquet(ledger_path)
    t = compacted_through(ledger_path)
    if t is not None:
        df = df.filter(
            (F.col("ingest_batch") == -1) | (F.col("ingest_batch") > t)
        )
    return df


def commit_baseline(
    baseline: DataFrame, ledger_path: str, through_batch: int
) -> None:
    """Steps 1–2 of the protocol: stage ``baseline`` (WITHOUT an
    ``ingest_batch`` column — the directory name supplies it) plus the
    marker, then swap onto ``ingest_batch=-1`` atomically. Fully
    materializes the staging copy before touching any live directory,
    so the baseline may derive from the very partitions it replaces."""
    root = Path(ledger_path)
    staging, base, trash = (
        root / _STAGING_DIR,
        root / BASELINE_DIR,
        root / _TRASH_DIR,
    )
    if staging.exists():
        _rmtree(staging)
    baseline.write.mode("overwrite").parquet(str(staging))
    (staging / MARKER_FILE).write_text(str(int(through_batch)))
    if base.exists():
        _rename(base, trash)
    _rename(staging, base)  # COMMIT POINT: rows + marker together
    if trash.exists():
        _rmtree(trash)


def delete_folded(ledger_path: str, through_batch: int) -> None:
    """Step 3: remove batch partitions the committed marker already
    covers. Safe to crash anywhere — readers exclude these — and safe
    to re-run; recompaction also sweeps stragglers from prior runs."""
    for d in Path(ledger_path).glob("ingest_batch=*"):
        suffix = d.name.split("=", 1)[1]
        if suffix != "-1" and int(suffix) <= through_batch:
            _rmtree(d)
