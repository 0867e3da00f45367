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

Crash recovery is split by role. Readers (:func:`recover_compaction`,
run by every :func:`read_ledger`) fix only the state they cannot read
through — baseline missing because a swap died between its two
renames → roll the trash back — and never delete anything, so a
reader can never kill a live compactor's staging. Compactors
(:func:`commit_baseline`) own the staging/trash lifecycle and sweep a
dead predecessor's leftovers on entry: staging present → the commit
never happened, discard; trash present with a live baseline → a
committed swap's leftover old baseline, discard. Every recovery
restores the exact pre- or post-commit answer. The directory renames
carry the same POSIX-atomicity assumption every swap in this repo
states (`sources/lake.py` — on an object store, replace the rename
pair with a manifest-pointer update, the Iceberg/Delta commit model).

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
    """Reader-side recovery: resolve the ONE crash state a reader
    cannot answer correctly through — baseline missing because a
    compactor died between its two swap renames — by rolling the
    trashed old baseline back. Deliberately does NOTHING else: leftover
    staging/trash dirs are invisible to Spark (dot-prefixed) and
    harmless to answers, and a reader that deleted them could kill a
    LIVE compactor's staging mid-write. Full cleanup belongs to the
    next compactor (:func:`commit_baseline`), which owns those dirs.
    A reader racing an in-flight swap may roll back a baseline the
    compactor just moved aside — the compactor's commit rename then
    fails (destination exists) and the ledger stays at its old
    consistent state: reads are always right, a racing compaction
    fails retryably, nothing corrupts. (The documented maintenance-
    window contract makes the race moot in normal operation.)"""
    root = Path(ledger_path)
    base, trash = root / BASELINE_DIR, root / _TRASH_DIR
    if not base.exists() and trash.exists():
        _rename(trash, base)


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
    # compactor-owned cleanup of prior crashes: discard a dead run's
    # staging, roll back or discard its trash (roll back only when the
    # baseline is missing — otherwise the trash is a committed swap's
    # leftover old baseline)
    if staging.exists():
        _rmtree(staging)
    if trash.exists():
        if not base.exists():
            _rename(trash, base)
        else:
            _rmtree(trash)
    baseline.write.mode("overwrite").parquet(str(staging))
    (staging / MARKER_FILE).write_text(str(int(through_batch)))
    if base.exists():
        _rename(base, trash)
    _rename(staging, base)  # COMMIT POINT: rows + marker together
    if trash.exists():
        _rmtree(trash)


def require_unfolded_range(
    ledger_path: str, since_batch: int, op_name: str, what: str = "ledger"
) -> None:
    """Guard for range reads (``ingest_batch > since_batch``): a batch
    folded into the baseline has no partition left to slice, so a
    range reaching into compacted history must RAISE — an answer
    silently missing the folded mass is worse than no answer. Keep the
    compaction horizon behind the longest window you query."""
    t = compacted_through(ledger_path)
    if t is not None and since_batch < t:
        raise ValueError(
            f"{op_name}: the {what} store is compacted through batch "
            f"{t} but the range starts after batch {since_batch} - "
            "folded history cannot be re-sliced. Query a range inside "
            "the unfolded suffix, or compact less aggressively (keep "
            "the horizon behind the longest window you query)."
        )


def sweep_stragglers(ledger_path: str) -> None:
    """Delete any batch partitions the COMMITTED marker already covers
    — the retry path after a crash between commit and deletion. Called
    at the top of every compaction so a ledger whose feed went quiet
    (no new batches to fold, so the fold step early-returns) still
    converges to clean physical state. No-op without a marker."""
    t = compacted_through(ledger_path)
    if t is not None:
        delete_folded(ledger_path, t)


def delete_folded(ledger_path: str, through_batch: int) -> None:
    """Step 3: remove batch partitions the committed marker already
    covers. Safe to crash anywhere — readers exclude these — and safe
    to re-run; recompaction also sweeps stragglers from prior runs."""
    for d in Path(ledger_path).glob("ingest_batch=*"):
        suffix = d.name.split("=", 1)[1]
        if suffix != "-1" and int(suffix) <= through_batch:
            _rmtree(d)
