"""Distribution drift between two snapshots of a numeric column:
equi-width histograms + Population Stability Index — the day-over-day
"did the data change shape" monitor that catches what row counts and
cardinality ledgers (`operators/sketches.py`) cannot: same volume, same
keys, different distribution (a feed that silently started sending
lengths in characters instead of tokens, a quality score whose model
was retrained upstream).

PSI = Σ (pᵢ − qᵢ) · ln(pᵢ / qᵢ) over shared histogram bins, with the
standard ε-floor on empty bins so the sum stays finite. The usual
reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate —
thresholds belong to the caller's alerting, not the operator.

Plan shape: the BASELINE side fixes the binning (its min/max → shared
equi-width edges, one scalar aggregation broadcast as literals); both
sides then reduce to ``bins``-row histograms via one partial-agg'd
aggregation each, and PSI is computed on the joined bin tables —
everything after the two scans is bins-sized. Rows outside the
baseline range clamp into the edge bins (drift INTO the tails is
exactly what must not be dropped); NULLs are excluded and reported as
their own rates, since a null-rate change is drift too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EPS = 1e-6


def histogram(
    df: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """(bin, n) over [lo, hi] equi-width bins; out-of-range clamps to
    the edge bins. One aggregation."""
    if bins < 2 or not hi > lo:
        raise ValueError("histogram: need bins >= 2 and hi > lo")
    c = F.col(col)
    idx = F.least(
        F.greatest(
            F.floor((c - lo) / ((hi - lo) / bins)).cast("long"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    return (
        df.filter(c.isNotNull())
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    bins: int = 20,
) -> dict:
    """One-dict drift report: ``psi``, per-side row and null counts,
    and the shared binning. Binning is fixed by the BASELINE's min/max
    (current data outside it clamps into the edge bins — visible as
    mass concentration there, which PSI punishes)."""
    stats = baseline.agg(
        F.min(F.col(col)).alias("lo"),
        F.max(F.col(col)).alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
    ).collect()[0]
    if stats["lo"] is None or not stats["hi"] > stats["lo"]:
        raise ValueError(
            "psi_report: baseline needs >= 2 distinct non-null values"
        )
    lo, hi = float(stats["lo"]), float(stats["hi"])
    cur_stats = current.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
    ).collect()[0]
    hb = histogram(baseline, col, bins, lo, hi)
    hc = histogram(current, col, bins, lo, hi)
    joined = (
        hb.withColumnRenamed("n", "nb")
        .join(hc.withColumnRenamed("n", "nc"), "bin", "full_outer")
        .select(
            F.coalesce("nb", F.lit(0)).alias("nb"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    row = joined.agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    ).collect()[0]
    tb, tc = max(int(row["tb"]), 1), max(int(row["tc"]), 1)
    psi = joined.select(
        F.sum(
            (F.col("nb") / tb - F.col("nc") / tc)
            * F.log(
                (F.col("nb") / tb + EPS) / (F.col("nc") / tc + EPS)
            )
        ).alias("psi")
    ).collect()[0]["psi"]
    return {
        "psi": round(float(psi or 0.0), 6),
        "bins": bins,
        "lo": lo,
        "hi": hi,
        "baseline_rows": int(stats["n_rows"]),
        "baseline_nulls": int(stats["n_null"] or 0),
        "current_rows": int(cur_stats["n_rows"]),
        "current_nulls": int(cur_stats["n_null"] or 0),
    }


def categorical_drift_report(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    top_movers: int = 5,
) -> dict:
    """Categorical twin of :func:`psi_report` — PSI's equi-width bins
    have no meaning for ``lang`` / ``source`` / ``event_type`` columns,
    where drift is a CATEGORY FREQUENCY shift: a new language appearing,
    a source going dark, a class ratio sliding.

    Metrics, all over the full-outer category join (a category present
    on either side contributes — the lesson the streaming PSI fix
    encoded: one-sided joins hide exactly the new-mode mass that
    matters most):

    - ``js_divergence``: Jensen-Shannon divergence (natural log, so the
      bound is [0, ln 2]) — symmetric, finite even for disjoint
      supports, the standard distribution-shift scalar;
    - ``total_variation``: ½ Σ |p − q| — the "fraction of mass that
      moved" reading;
    - ``new_categories`` / ``vanished_categories``: present one side
      only (NULL category counts as its own category — a null-rate
      change is drift too);
    - ``top_movers``: the ``top_movers`` categories by |p − q| with
      both shares.

    Plan: each side reduces to one category-count aggregation
    (partial-agg'd, category-cardinality-sized output); everything
    after is category-table math. Two scans, nothing corpus-sized
    shuffles, no Python beyond assembling the report dict."""
    freqs = []
    for side, name in ((baseline, "p"), (current, "q")):
        f = (
            side.groupBy(
                F.coalesce(
                    F.col(col).cast("string"), F.lit("<null>")
                ).alias("cat")
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        total = f.agg(F.sum("n")).collect()[0][0] or 0
        if total == 0:
            raise ValueError(
                f"categorical_drift_report: empty {name} side"
            )
        freqs.append(
            f.select("cat", (F.col("n") / total).alias(name))
        )
    joined = (
        freqs[0]
        .join(freqs[1], "cat", "full_outer")
        .select(
            "cat",
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    kl_term = lambda x: F.when(  # noqa: E731 — local expression builder
        F.col(x) > 0, F.col(x) * F.log(F.col(x) / m)
    ).otherwise(F.lit(0.0))
    agg = joined.agg(
        F.round(
            (F.sum(kl_term("p")) + F.sum(kl_term("q"))) / 2.0, 6
        ).alias("jsd"),
        F.round(F.sum(F.abs(F.col("p") - F.col("q"))) / 2.0, 6).alias(
            "tv"
        ),
    ).collect()[0]
    # bounded collects only: a "categorical" column can turn out to be
    # high-cardinality (the misuse case), and an unbounded full-table
    # collect is exactly the driver-side trap this package bans — the
    # divergence aggregates stay fully distributed above; here each
    # list caps at max_listed (counts stay exact via the aggregation)
    max_listed = 100
    side_counts = joined.agg(
        F.sum((F.col("p") == 0.0).cast("long")).alias("n_new"),
        F.sum((F.col("q") == 0.0).cast("long")).alias("n_vanished"),
    ).collect()[0]
    movers = joined.orderBy(
        F.desc(F.abs(F.col("p") - F.col("q"))), F.asc("cat")
    ).limit(top_movers).collect()
    new_cats = (
        joined.filter(F.col("p") == 0.0)
        .orderBy("cat")
        .limit(max_listed)
        .collect()
    )
    gone_cats = (
        joined.filter(F.col("q") == 0.0)
        .orderBy("cat")
        .limit(max_listed)
        .collect()
    )
    return {
        "js_divergence": float(agg["jsd"]),
        "total_variation": float(agg["tv"]),
        "new_categories": [r["cat"] for r in new_cats],
        "vanished_categories": [r["cat"] for r in gone_cats],
        "n_new_categories": int(side_counts["n_new"]),
        "n_vanished_categories": int(side_counts["n_vanished"]),
        "top_movers": [
            {"cat": r["cat"], "p": r["p"], "q": r["q"]}
            for r in movers
        ],
    }
