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
