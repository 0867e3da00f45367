"""Mergeable sketch ledgers: HLL cardinality and theta set algebra.

Why this exists at 100 TB: distinct-count questions ("how many unique
documents / users / shingles did we ever ingest?") are a full keyed
shuffle as exact aggregations, and re-answering them over a growing
corpus rescans history every time. A sketch ledger inverts the cost:
each ingest batch (or day partition) reduces in ONE pass to a few-KB
binary sketch row, and every later question — total distinct over any
subset of days, overlap between two corpus snapshots, novelty rate of
today's batch against everything before it — is answered by merging
sketch rows, never rescanning data.

Two sketch families, both Apache DataSketches implementations exposed
as native Spark SQL aggregates (Spark 3.5+; `hll_sketch_agg`,
`theta_sketch_agg` and friends), so the build is JVM-side partial-agg'd
aggregation — map-side combine shrinks every partition to one sketch
before the (tiny) shuffle, and no Python runs anywhere:

- **HLL** (`hll_ledger` / `merge_hll_ledger`): cardinality only, but
  smallest, and merge is lossless over register state: merging is
  associative, grouping-insensitive, and idempotent (re-delivering a
  sketch is a no-op), so the incremental ledger stays inside the same
  error bound no matter how many times or in what order days merge.
  Two honest caveats, measured here on a 500-distinct fixture: a
  from-scratch single-pass build keeps DataSketches' HIP estimator
  while the union path falls back to the composite estimate (504
  direct vs 501 merged), and the composite estimate itself can move
  by a register tiebreak across aggregation-tree shapes (502 vs 503
  after a repartition of the same ledger). Everything stays inside
  the RSE bound; nothing is bit-stable across layouts — pin bounds,
  not bits, and the tests do.
- **Theta** (`theta_ledger` / `theta_overlap`): adds intersection and
  difference, i.e. estimated |A∩B|, |A∖B| and Jaccard between corpus
  snapshots at sketch cost. That makes it the cheap *screening*
  complement to exact decontamination (`operators/decontamination.py`)
  and exact dedup — run the sketch overlap first to decide whether the
  exact (join-heavy) machinery is worth scheduling at all, and use the
  novelty rate (|batch∖corpus| / |batch|) as the per-batch ingest
  health metric.

Error model: relative standard error ≈ 1.04/√(2^lg_k) for HLL
(~1.6% at the default lg_k=12) and ≈ 1/√k for theta (~1.6% at the
default k=4096 entries); below ~2^lg_k distinct values both run in
sparse/exact mode, so small-group ledger rows are exact. Oracle note:
DuckDB has no DataSketches-compatible aggregates, so these stay
pytest-pinned (estimates vs exact counts within the published bounds,
merge-vs-global equality) rather than driver-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_LG_K = 12  # 2^12 registers ≈ 1.6% RSE, 4 KB max sketch
DEFAULT_THETA_K = 4096


def hll_ledger(
    df: DataFrame,
    key_col: str,
    by: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One sketch row per ``by`` group: the HLL sketch of distinct
    ``key_col`` values plus its point estimate and the raw row count.

    Plan: a single hash aggregation (ObjectHashAggregate — sketches are
    typed imperative buffers, not codegen'd longs) with map-side partial
    sketches, so the shuffle carries one ≤4 KB sketch per (partition ×
    group), not rows. With ``by=None`` the result is one global row and
    the shuffle is a single-row exchange."""
    keys = list(by or [])
    aggs = [
        F.hll_sketch_agg(F.col(key_col).cast("string"), lg_k).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    grouped = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    return grouped.withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch")
    )


def merge_hll_ledger(
    ledger: DataFrame,
    by: list[str] | None = None,
) -> DataFrame:
    """Roll ledger rows up to coarser groups (or one total row with
    ``by=None``) by sketch union — the no-rescan path to "distinct over
    any subset of days". The union is associative, order- and
    grouping-insensitive, and idempotent, so any rollup lattice path
    yields the same estimate (pinned in tests); vs a from-scratch
    single-pass build the estimate can differ by a fraction of the RSE
    (HIP vs composite estimator — see the module docstring).

    Input is sketch rows (one per original group), so this aggregation
    is over a ledger-sized — not corpus-sized — operand."""
    keys = list(by or [])
    aggs = [
        F.hll_union_agg("sketch", True).alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    ]
    grouped = ledger.groupBy(*keys).agg(*aggs) if keys else ledger.agg(*aggs)
    return grouped.withColumn(
        "distinct_est", F.hll_sketch_estimate("sketch")
    )


def theta_ledger(
    df: DataFrame,
    key_col: str,
    by: list[str] | None = None,
    k: int = DEFAULT_THETA_K,
) -> DataFrame:
    """Theta-sketch twin of :func:`hll_ledger` — same one-aggregation
    shape, bigger sketches (≈8·k bytes max), but the rows support set
    algebra (:func:`theta_overlap`), not just union cardinality."""
    keys = list(by or [])
    # theta_sketch_agg's lgNomEntries arg is log2 of nominal entries.
    lg = max(4, (k - 1).bit_length())
    aggs = [
        F.theta_sketch_agg(F.col(key_col).cast("string"), lg).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    grouped = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    return grouped.withColumn(
        "distinct_est", F.theta_sketch_estimate("sketch")
    )


def theta_overlap(
    ledger: DataFrame,
    group_col: str,
    a: str,
    b: str,
) -> DataFrame:
    """Set-algebra report between two ledger rows (snapshots ``a`` and
    ``b`` of ``group_col``): estimated cardinalities of each side, the
    union, the intersection, both differences, the Jaccard estimate,
    and ``novelty_b`` = |B∖A| / |B| — "what fraction of snapshot b is
    new relative to a", the per-batch ingest health metric.

    Plan: two one-row filters on the ledger and a 1×1 cross join, then
    scalar theta operators — nothing here ever touches raw data, so the
    whole report costs microseconds regardless of corpus size."""
    left = ledger.filter(F.col(group_col) == a).select(
        F.col("sketch").alias("sk_a")
    )
    right = ledger.filter(F.col(group_col) == b).select(
        F.col("sketch").alias("sk_b")
    )
    est = F.theta_sketch_estimate
    return (
        left.crossJoin(right)
        .select(
            F.lit(a).alias("snapshot_a"),
            F.lit(b).alias("snapshot_b"),
            est(F.col("sk_a")).alias("est_a"),
            est(F.col("sk_b")).alias("est_b"),
            est(F.theta_union("sk_a", "sk_b")).alias("est_union"),
            est(F.theta_intersection("sk_a", "sk_b")).alias(
                "est_intersection"
            ),
            est(F.theta_difference("sk_a", "sk_b")).alias("est_a_only"),
            est(F.theta_difference("sk_b", "sk_a")).alias("est_b_only"),
        )
        .withColumn(
            "jaccard_est",
            F.when(F.col("est_union") > 0,
                   F.col("est_intersection") / F.col("est_union"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "novelty_b",
            F.when(F.col("est_b") > 0,
                   F.col("est_b_only") / F.col("est_b"))
            .otherwise(F.lit(0.0)),
        )
    )


def theta_overlap_matrix(
    ledger: DataFrame,
    group_col: str,
) -> DataFrame:
    """All-pairs :func:`theta_overlap`: one row per unordered group
    pair with (est_a, est_b, est_intersection, jaccard_est) — the
    cross-SOURCE contamination screen ("which of my 40 corpus sources
    share content?") that decides where to point the exact dedup
    machinery, at sketch cost.

    Plan: a self cross join of LEDGER rows — groups² pairs of ≤8·k-byte
    sketches, a bounded operand by the ledger's nature (sources/days,
    never documents); the ``<`` filter halves it to unordered pairs.
    Raw data is never touched; a 40-source matrix is 780 sketch
    intersections, milliseconds."""
    a = ledger.select(
        F.col(group_col).alias("group_a"),
        F.col("sketch").alias("__sk_a"),
    )
    b = ledger.select(
        F.col(group_col).alias("group_b"),
        F.col("sketch").alias("__sk_b"),
    )
    est = F.theta_sketch_estimate
    return (
        a.crossJoin(b)
        .filter(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            est(F.col("__sk_a")).alias("est_a"),
            est(F.col("__sk_b")).alias("est_b"),
            est(F.theta_intersection("__sk_a", "__sk_b")).alias(
                "est_intersection"
            ),
            est(F.theta_union("__sk_a", "__sk_b")).alias("est_union"),
        )
        .withColumn(
            "jaccard_est",
            F.when(
                F.col("est_union") > 0,
                F.col("est_intersection") / F.col("est_union"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy(F.desc("jaccard_est"), "group_a", "group_b")
    )
