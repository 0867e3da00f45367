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
the l-diversity critique, Machanavajjhala et al. 2006; AUDIT it with
:func:`sensitive_diversity_audit`) or attacker background knowledge,
and repeated releases of overlapping cohorts leak through
differencing (AUDIT it with :func:`release_differencing_audit` —
both are detectors informing a policy call, neither is a fix).
Use it as the export linter it is: it
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


def sensitive_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """(quasi..., n, n_sensitive_values): every quasi-identifier group
    whose SENSITIVE column takes fewer than ``l`` distinct values --
    the homogeneity attack the module honesty box names: a group can
    be perfectly k-anonymous and still disclose the sensitive value
    because every member shares it (the l-diversity critique,
    Machanavajjhala et al. 2006). This is the AUDIT for that failure,
    not a fix: treatment (generalize the quasi columns, suppress the
    group, widen the cohort) is a policy call the report informs.
    A NULL sensitive value counts as a value of its own (an attacker
    learns "no diagnosis recorded" the same way). One partial-agg'd
    groupBy; output <= distinct combos, only under-l groups survive."""
    if l < 2:
        raise ValueError("sensitive_diversity_audit: l must be >= 2")
    if not quasi_cols:
        raise ValueError(
            "sensitive_diversity_audit: quasi_cols must be non-empty"
        )
    n_values = (
        F.countDistinct(sensitive_col)
        + F.max(F.col(sensitive_col).isNull().cast("long"))
    ).cast("long")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            n_values.alias("n_sensitive_values"),
        )
        .filter(F.col("n_sensitive_values") < l)
        .orderBy("n_sensitive_values", "n", *quasi_cols)
    )


def release_differencing_audit(
    release_a: DataFrame,
    release_b: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """(quasi..., n_a, n_b, n_diff): quasi-identifier combinations
    whose row counts in two overlapping releases differ by
    ``0 < n_diff < k`` -- the differencing attack the module honesty
    box names: each release is k-anonymous on its own, but subtracting
    them isolates a sub-k cohort (the members added or removed between
    the two). Combos present in only one release audit the same way
    (the other side counts 0 -- the whole group is the difference).

    One partial-agg'd groupBy per release and a combo-keyed full-outer
    join of the two count tables (combo-sized operands, never
    row-sized); the join key is a single struct of the quasi columns,
    the house null-safe pattern -- struct equality makes NULL quasi
    values one group on both sides, which is also the attack model
    (NULL zip is a joinable value)."""
    if k < 2:
        raise ValueError("release_differencing_audit: k must be >= 2")
    if not quasi_cols:
        raise ValueError(
            "release_differencing_audit: quasi_cols must be non-empty"
        )

    def counts(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy(
            F.struct(*[F.col(c) for c in quasi_cols]).alias("__q")
        ).agg(F.count(F.lit(1)).alias(out))

    a, b = counts(release_a, "n_a"), counts(release_b, "n_b")
    joined = a.join(b, "__q", "full_outer").select(
        "__q",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    return (
        joined.withColumn("n_diff", F.abs(F.col("n_a") - F.col("n_b")))
        .filter((F.col("n_diff") > 0) & (F.col("n_diff") < k))
        .select(
            *[F.col("__q")[c].alias(c) for c in quasi_cols],
            "n_a",
            "n_b",
            "n_diff",
        )
        .orderBy("n_diff", *quasi_cols)
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
