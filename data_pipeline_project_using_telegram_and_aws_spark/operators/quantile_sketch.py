"""Mergeable quantile ledger: bottom-k uniform samples per group.

The quantile complement to `operators/sketches.py`'s HLL/theta rows.
Distinct counts merge via register union; quantiles have no such
built-in mergeable aggregate in Spark SQL (``percentile_approx`` is a
sketch internally but its state is not exposed as a column). The
classic trick closes the gap EXACTLY: assign every row a deterministic
uniform die (a hash of its unique id) and keep, per group, the ``k``
rows with the smallest dice. That bottom-k sample is a *losslessly
mergeable* sketch —

    bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B))

because any union-winner is ≤ everything in its own subset, hence in
its subset's bottom-k. So per-day ledger rows merge into per-month or
all-time rows with NO approximation added by the merge itself (pinned
bit-for-bit in tests), and the only error is the sampling error of a
k-sized uniform sample: quantile RSE ≈ √(q(1−q)/k) — ~1.6% at the
default k=1024 for the median. Groups with ≤ k rows are EXACT.

Exact min/max and the row count ride along on every ledger row (both
are losslessly mergeable on their own), so the extreme quantiles
(q=0, q=1) are always exact and estimates can be audited against n.

Plan shape, stated honestly: the build is one keyed shuffle of
(group, die, value) triples plus a per-group rank window — rows
shuffle once, narrow. There is no map-side combine (bottom-k has no
native partial aggregate), which is the deliberate trade against a
Python UDAF: the shuffle carries three thin columns and the window is
whole-stage codegen. The merge aggregates LEDGER rows (k-sized arrays
per group), never raw data — that is the entire point.

Die determinism: the die is ``md5(id)``, so ledgers are reproducible
across runs and layouts, and re-delivering the same rows is a no-op
under merge (idempotent, like the HLL union). The id column must be
unique per row — duplicate ids would correlate dice and bias the
sample toward duplicated rows; that contract is the caller's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_K = 1024


def quantile_ledger(
    df: DataFrame,
    value_col: str,
    id_col: str,
    by: list[str] | None = None,
    k: int = DEFAULT_K,
    salt_partitions: int = 64,
) -> DataFrame:
    """One ledger row per ``by`` group: ``sample`` = the k
    (die, value) pairs with the smallest dice (die-sorted array),
    plus exact ``n_rows`` (non-null values), ``lo`` / ``hi``, and
    ``n_null``. NULLs never enter the sample or the extremes.

    Scale shape — salted two-stage bottom-k, because a single rank
    window per group would funnel a whole group (the ENTIRE corpus
    when ``by=None``) through one task: stage 1 ranks within
    (group, salt) partitions — ``salt_partitions``-way parallelism,
    each sorting ~1/S of the group — and stage 2 merges the S
    ledger-sized per-salt bottom-k arrays exactly as
    :func:`merge_quantile_ledger` does (bottom-k of a union IS the
    bottom-k of the per-part bottom-ks, so the result is bit-identical
    to the unsalted rank — pinned by the layout-invariance tests). The
    exact counters ride the same stage-2 aggregation, partial-agg'd
    from stage-1 rows. ``salt_partitions`` dials stage-1 parallelism;
    per-salt sort work is n/(S·groups) rows per task, spill-safe."""
    if k < 1:
        raise ValueError("quantile_ledger: k must be >= 1")
    if salt_partitions < 1:
        raise ValueError("quantile_ledger: salt_partitions must be >= 1")
    keys = list(by or [])
    slim = df.select(
        *keys,
        F.md5(F.col(id_col).cast("string")).alias("__die"),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col("__die")), F.lit(salt_partitions)),
    )
    # stage 1: rank within (group, salt); nulls rank LAST so they
    # never consume sample slots, and the isNotNull guard keeps them
    # out even when a salt cell has fewer than k non-null rows
    w = Window.partitionBy(*keys, "__salt").orderBy(
        F.col("__v").isNull().asc(), F.col("__die").asc()
    )
    ranked = slim.withColumn("__rk", F.row_number().over(w))
    keep = F.when(
        (F.col("__rk") <= k) & F.col("__v").isNotNull(),
        F.struct(F.col("__die").alias("die"), F.col("__v").alias("v")),
    )
    # stage 2: per-group merge of the per-salt bottom-ks + the exact
    # counters (sums/min/max — partial-aggregated over stage-1 rows)
    aggs = [
        F.slice(
            F.array_sort(F.collect_list(keep)), 1, k
        ).alias("sample"),
        F.sum(F.col("__v").isNotNull().cast("long")).alias("n_rows"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        F.sum(F.col("__v").isNull().cast("long")).alias("n_null"),
    ]
    return ranked.groupBy(*keys).agg(*aggs) if keys else ranked.agg(*aggs)


def merge_quantile_ledger(
    ledger: DataFrame,
    by: list[str] | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Roll ledger rows up to coarser groups (or one all-time row with
    ``by=None``): concatenate the samples, keep the k smallest dice —
    EXACTLY the bottom-k of the union (see module docstring), so
    merging adds zero error and is associative, layout-insensitive and
    — for the sample — idempotent under replay (set union via
    array_distinct). The exact counters (n_rows/n_null) are SUMS and do
    double-count a replayed ledger row, same as the HLL ledger's
    n_rows: feed each ledger row once. Operates on ledger-sized rows
    only; raw data is never touched."""
    keys = list(by or [])
    aggs = [
        # array_distinct = SET union: a re-delivered ledger row merges
        # to a no-op (idempotence, like the HLL register union) instead
        # of double-counting its (die, value) pairs in the bottom-k
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("sample")))
            ),
            1,
            k,
        ).alias("sample"),
        F.sum("n_rows").alias("n_rows"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum("n_null").alias("n_null"),
    ]
    return ledger.groupBy(*keys).agg(*aggs) if keys else ledger.agg(*aggs)


def ledger_quantiles(
    ledger: DataFrame, qs: list[float]
) -> DataFrame:
    """Append ``q_<...>`` estimate columns to each ledger row: the
    empirical quantile of the sample values, with the exact ``lo`` /
    ``hi`` substituted at q=0 / q=1 (those are tracked exactly). A
    pure projection over ledger rows — row-local array math, no
    shuffle, no Python."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"ledger_quantiles: q={q} outside [0, 1]")
    vals = F.array_sort(
        F.transform(F.col("sample"), lambda s: s["v"])
    )
    out = ledger.withColumn("__vals", vals)
    s = F.size("__vals")
    for q in qs:
        name = f"q_{str(q).replace('.', '_')}"
        if q == 0.0:
            est = F.col("lo")
        elif q == 1.0:
            est = F.col("hi")
        else:
            # nearest-rank on the sample: index floor(q*(s-1)) (0-based)
            idx = F.floor(F.lit(q) * (s - F.lit(1))).cast("int") + F.lit(1)
            est = F.when(s > 0, F.element_at("__vals", idx))
        out = out.withColumn(name, est)
    return out.drop("__vals")
