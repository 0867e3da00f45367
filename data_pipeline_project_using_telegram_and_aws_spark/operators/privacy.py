"""Disclosure-risk gates for dataset EXPORT — the release-side
complement of `operators/redaction.py` (which rewrites values:
PII scrubbing, keyed pseudonymization). These operators act on GROUP
SIZES: a row whose quasi-identifier combination (zip × birth-year ×
device-model…) is shared by fewer than k released rows is
re-identifiable by joining any outside dataset on those columns —
the attack model behind k-anonymity (Sweeney 2002).

Honesty box, stated up front: group-size enforcement is the WEAK
baseline, not a privacy proof. It does nothing against attribute
homogeneity inside a group (every member shares the sensitive value —
the l-diversity critique, Machanavajjhala et al. 2006) or attacker
background knowledge, and repeated releases of overlapping cohorts
leak through differencing. Use it as the export linter it is: it
catches the embarrassing failure (singleton combos in a public drop)
cheaply and loudly, and its report names exactly which combinations
are risky.

Plan shapes: `rare_combinations` is one partial-agg'd groupBy
(output ≤ distinct combos, and only those under k survive the
HAVING); `enforce_k_anonymity` is one count window over the quasi
columns (the same hash shuffle a groupBy would pay — no join back);
`suppress_small_groups` is a filter on an already-aggregated frame
(free). NULL quasi values group together in all three — SQL groupBy
semantics, which is also the correct attack model: NULL zip is itself
a joinable value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rare_combinations(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """(quasi..., n): every quasi-identifier combination carried by
    FEWER than ``k`` rows — the audit listing of what
    :func:`enforce_k_anonymity` would remove, for reading BEFORE
    deciding. Sorted ascending by n so singletons (the worst) lead."""
    if k < 2:
        raise ValueError("rare_combinations: k must be >= 2")
    if not quasi_cols:
        raise ValueError("rare_combinations: quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
        .orderBy("n", *quasi_cols)
    )


def enforce_k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    on_violation: str = "drop",
) -> DataFrame:
    """Release gate: keep only rows whose quasi-identifier combination
    appears ≥ ``k`` times in the RELEASED frame itself.

    ``on_violation``:

    - ``"drop"`` (default): suppress the under-k rows (the surviving
      frame is k-anonymous over ``quasi_cols`` by construction —
      dropping rows can only shrink other groups' counts to zero,
      never into (0, k)).
    - ``"fail"``: assert_true in-plan — the export job dies naming the
      first offending combination and its count, for pipelines where
      an under-k combo means an upstream selection bug rather than
      expected long-tail data.

    One count window over the quasi columns; no second pass, no join.
    """
    if k < 2:
        raise ValueError("enforce_k_anonymity: k must be >= 2")
    if not quasi_cols:
        raise ValueError("enforce_k_anonymity: quasi_cols must be non-empty")
    if on_violation not in ("drop", "fail"):
        raise ValueError(
            "enforce_k_anonymity: on_violation must be drop | fail"
        )
    n = F.count(F.lit(1)).over(Window.partitionBy(*quasi_cols))
    if on_violation == "drop":
        return df.withColumn("__qn", n).filter(
            F.col("__qn") >= k
        ).drop("__qn")
    combo = F.concat_ws(
        ",",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("NULL"))
            for c in quasi_cols
        ],
    )
    return (
        df.withColumn("__qn", n)
        .filter(
            F.assert_true(
                F.col("__qn") >= F.lit(k),
                F.concat_ws(
                    " ",
                    F.lit(
                        "enforce_k_anonymity: quasi-identifier "
                        f"combination ({', '.join(quasi_cols)}) ="
                    ),
                    combo,
                    F.lit("appears"),
                    F.col("__qn").cast("string"),
                    F.lit(f"< k={k} times in the release"),
                ),
            ).isNull()
        )
        .drop("__qn")
    )


def suppress_small_groups(
    agg_df: DataFrame, count_col: str, k: int
) -> DataFrame:
    """Export gate for an ALREADY-AGGREGATED frame (a published
    statistics table): drop aggregate rows computed over fewer than
    ``k`` underlying rows — the standard minimum-cell-size rule for
    released tabulations. Requires the aggregation to have carried an
    exact count column; a filter, nothing more."""
    if k < 2:
        raise ValueError("suppress_small_groups: k must be >= 2")
    return agg_df.filter(F.col(count_col) >= k)
