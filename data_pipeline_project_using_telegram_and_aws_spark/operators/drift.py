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


def ks_from_quantile_ledgers(
    a: DataFrame,
    b: DataFrame,
    by: list[str] | None = None,
) -> DataFrame:
    """(…by, ks, n_a, n_b, d_crit_95, drifted) — the two-sample
    Kolmogorov-Smirnov statistic between two `quantile_sketch.
    quantile_ledger` rows per group: ``sup_x |F_a(x) − F_b(x)|`` over
    the ledgers' uniform samples (the bottom-k-by-hash-die sample IS a
    simple random sample of the group's values, so the sample ECDFs
    estimate the population ones). Where `psi_report` needs the raw
    rows twice and a binning choice, this reads two ALREADY-MAINTAINED
    ledgers — the day-over-day shape check at ledger price, binless and
    scale-invariant.

    ``d_crit_95`` is the asymptotic 95% two-sample critical value
    ``1.358·√((n_a+n_b)/(n_a·n_b))`` with the SAMPLE sizes (≤ k), and
    ``drifted = ks > d_crit_95`` — both stated as estimates: with
    groups larger than k the test's resolution is the sample's, not
    the population's (the operator answers "did the shape move more
    than these two k-samples can explain by chance"). Groups present
    in only one ledger report NULL ks (no comparison, not "no drift").

    Ties are handled exactly (RANGE frame: the CDF gap is evaluated
    with all equal values consumed on both sides). Plan: two
    ledger-row explodes (≤ 2k rows per group), ONE group-keyed window
    exchange that the final aggregation reuses, no Python."""
    from pyspark.sql import Window

    keys = list(by or [])

    def _side(led: DataFrame, tag: str) -> DataFrame:
        vals = F.transform(F.col("sample"), lambda s: s["v"])
        return led.select(
            *keys, F.explode(vals).alias("__v"), F.lit(tag).alias("__s")
        )

    u = _side(a, "a").unionByName(_side(b, "b"))
    w = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*keys)
    cum_a = F.sum(F.when(F.col("__s") == "a", 1).otherwise(0)).over(w)
    cum_b = F.sum(F.when(F.col("__s") == "b", 1).otherwise(0)).over(w)
    n_a = F.sum(F.when(F.col("__s") == "a", 1).otherwise(0)).over(wg)
    n_b = F.sum(F.when(F.col("__s") == "b", 1).otherwise(0)).over(wg)
    stepped = u.select(
        *keys,
        n_a.alias("__na"),
        n_b.alias("__nb"),
        F.when(
            (n_a > 0) & (n_b > 0),
            F.abs(cum_a / n_a - cum_b / n_b),
        ).alias("__gap"),
    )
    agg = stepped.groupBy(*keys).agg(
        F.round(F.max("__gap"), 6).alias("ks"),
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
    )
    d_crit = F.round(
        1.358
        * F.sqrt(
            (F.col("n_a") + F.col("n_b")) / (F.col("n_a") * F.col("n_b"))
        ),
        6,
    )
    return agg.select(
        *keys,
        "ks",
        "n_a",
        "n_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), d_crit).alias(
            "d_crit_95"
        ),
        F.when(
            F.col("ks").isNotNull(),
            F.col("ks") > d_crit,
        ).alias("drifted"),
    )
