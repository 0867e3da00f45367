"""Skew mitigation: salted equi-join for hot keys.

Spark's AQE skew-join (`spark.sql.adaptive.skewJoin.*`, on by default in
this engine's sessions) splits oversized sort-merge partitions at
runtime and is the first line of defense. Manual salting remains the
tool when (a) the hot side feeds a *shuffled hash* join AQE won't split,
(b) one key alone exceeds executor memory even after AQE's partition
split, or (c) the join is keyed for downstream bucketing and the salt
must be part of the layout. The classic recipe:

- big (skewed) side: append ``salt = hash(whole row) % n`` — any per-row
  value works because the salt only spreads rows of the SAME key across
  ``n`` reducers;
- small side: replicate each row once per salt value (``explode`` of a
  ``sequence``), so every (key, salt) reducer finds its match.

Cost model: the small side's shuffle volume multiplies by ``n_salts``
while the hot key's reducer shrinks by the same factor — size ``n_salts``
to the ratio between the hottest key's row count and a comfortable
per-task row count, not higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``key`` with the hot side salted
    across ``n_salts`` reducers per key. Result is row-identical to the
    plain join (salt columns never escape). ``how`` supports inner/left
    — the replicated build side makes right/full semantics ambiguous, so
    they are rejected.

    Size ``n_salts`` with ``functions.scale_rules.skew_n_salts`` from the
    hottest key's observed row count (e.g. a groupBy-count profile of
    the key column): enough salts to shrink that key's reducer to a
    per-task target, no more — every salt replicates the small side's
    shuffle volume once (module cost model above)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: replicating "
            "the small side breaks right/full outer multiplicity"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed(key, "__rk")
    joined = left.join(
        right, (F.col(key) == F.col("__rk")) & (left["__salt"] == right["__salt"]),
        how,
    )
    return joined.drop("__salt").drop("__rk")


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    percentiles: list[float] | None = None,
) -> DataFrame:
    """Key-distribution diagnosis BEFORE choosing a join strategy: the
    per-key row-count percentiles, the hottest ``top`` keys with their
    counts, and the hot-key share — the evidence behind an informed
    ``n_salts`` (``scale_rules.skew_salts`` wants the hottest count)
    versus just letting AQE's skew split handle it.

    Output is one row: percentile array, total rows/keys, top keys as
    (key, n) structs, and ``top1_share`` (hottest key's fraction of all
    rows). Cost: the per-key count aggregation (the same shuffle the
    join under diagnosis would pay) + a top-sized sort — run it on a
    sample for a quick look, on the full table for the real sizing."""
    ps = percentiles or [0.5, 0.9, 0.99, 1.0]
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    topk = (
        counts.orderBy(F.desc("n"), "key")
        .limit(top)
        .agg(
            F.collect_list(
                F.struct(F.col("key").cast("string").alias("key"), "n")
            ).alias("top_keys")
        )
    )
    summary = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.percentile_approx("n", ps, 10_000).alias("count_percentiles"),
    )
    return (
        summary.crossJoin(F.broadcast(topk))
        .withColumn(
            "top1_share",
            F.round(F.col("max_key_rows") / F.col("total_rows"), 6),
        )
        .withColumn(
            "percentile_labels",
            F.array(*[F.lit(p) for p in ps]),
        )
    )
