"""Scale-adaptive input spreading for compute-heavy per-row stages.

The problem (r13 optimization round, guide §2.5 "input skew"): a local
bench corpus is one small parquet file, so every scan plans 1-3 input
partitions (``maxPartitionBytes`` = 128 MB, ``openCostInBytes`` = 4 MB
floor) — and every expensive *projection* that runs before the first
exchange (md5 chains, interpreted higher-order-function folds, per-term
token scans, gram explodes) executes on 1-3 cores of the 32 available.
AQE cannot help: it only re-optimizes *post-shuffle* partition counts,
and its byte-based coalescing actively re-serializes tiny-but-
compute-hot stages onto one core (bytes are a bad proxy for stage cost
when a stage's per-row work is amplified by explodes or interpreted
expression evaluation).

The fix is the pattern ``operators/dedup.py`` introduced in an earlier
round, promoted here to a shared helper: hash-repartition up to the
session's ``defaultParallelism`` **only when the input has fewer
partitions** — on a real multi-file 100 TB scan the input is already
wide and this is a no-op, so nothing here is tuned to ``local[32]``;
the dial is the live session's core count, which is exactly what the
driver varies when it measures core-count scaling.

Keying the repartition by the row id keeps every per-id row group
co-located, so downstream id-keyed aggregations see the same element
sets (and the same intra-group arrival order) as the unspread plan —
floating-point aggregation results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str, width: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` up to the session's default
    parallelism when the current plan yields fewer partitions; no-op on
    an already-wide input.

    Driver-cost note (r13 ADVICE): the partition-count probe
    (``df.rdd.getNumPartitions()``) forces full physical planning and
    RDD conversion of the upstream plan AT CALL TIME — cheap for the
    shallow scan-rooted inputs every current call site passes, but
    real planning overhead on deep lineages, and the pre-execution
    count can diverge from AQE's runtime partitioning. Call it once
    per lineage, as close to the scan as the float-order screen
    allows; a deep-lineage caller that already knows its input's
    physical width can pass ``width`` to skip the probe entirely."""
    want = df.sparkSession.sparkContext.defaultParallelism
    have = width if width is not None else df.rdd.getNumPartitions()
    if have < want:
        return df.repartition(want, key)
    return df
