"""Recrawl scheduling — per-URL change-rate estimation from fetch
history and staleness-driven revisit ordering, the piece that turns
the crawl loop (frontier → politeness → fetch → ingest) into a
CONTINUOUS crawler: which already-crawled pages are worth fetching
again, and when. The reference pipeline has no crawl surface at all;
this extends the round-11 link/frontier stack
(`links.build_frontier`, `robots.schedule_fetches`) with the revisit
side every production crawler needs.

Method: a page's changes are modeled Poisson with rate λ (the
standard model for web change; Cho & Garcia-Molina, "Estimating
Frequency of Change", ACM TOIT 2003). Repeated fetches observe only
whether the content digest DIFFERED between consecutive visits —
multiple changes inside one interval collapse into one observation —
so the naive X/T estimate biases low. This module uses the paper's
bias-corrected estimator

    λ̂ = -log( (n - X + 0.5) / (n + 0.5) ) / Ī

with n consecutive-fetch intervals, X of them showing a changed
digest, and Ī the mean interval. Stated contracts: the estimator is
exact for evenly spaced fetches and an approximation under irregular
spacing (Ī stands in for the per-interval exposure); X = 0 yields
λ̂ = 0 (no evidence of change), X = n stays finite (the +0.5
correction's purpose). Staleness after ``age`` seconds is the Poisson
P(≥1 change) = 1 − exp(−λ̂·age).

Spark shape: one per-URL window (lag digest, lag fetch time — the
url-keyed shard a crawl ledger naturally has) + one groupBy url for
the estimator; scheduling is pure projections plus ONE global
top-``budget`` selection (Spark's TakeOrdered — no full sort
materializes). Composes with `robots.schedule_fetches` for per-host
politeness offsets on the selected list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def estimate_change_rates(
    observations: DataFrame,
    url_col: str = "url",
    time_col: str = "fetch_time",
    digest_col: str = "digest",
) -> DataFrame:
    """Fetch history (url, fetch_time epoch-seconds, content digest)
    → one row per url: ``(url, n_fetches, n_intervals, n_changes,
    mean_interval_s, change_rate, last_fetch_time, last_digest)``.

    ``change_rate`` is the bias-corrected Poisson λ̂ per SECOND
    (module note); NULL when the url has fewer than 2 fetches (no
    interval evidence — feed ``prior_rate`` at scheduling time).
    Duplicate fetch timestamps contribute zero-length intervals to
    Ī and count a change only if the digest moved — honest for
    at-least-once fetch ledgers."""
    w = Window.partitionBy("url").orderBy("__t", "__d")
    lagged = observations.select(
        F.col(url_col).alias("url"),
        F.col(time_col).cast("double").alias("__t"),
        F.col(digest_col).alias("__d"),
    ).select(
        "url", "__t", "__d",
        F.lag("__t").over(w).alias("__pt"),
        F.lag("__d").over(w).alias("__pd"),
    )
    per_url = lagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.count("__pt").alias("n_intervals"),
        F.sum(
            F.when(
                F.col("__pt").isNotNull()
                & ~F.col("__d").eqNullSafe(F.col("__pd")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.sum(
            F.when(
                F.col("__pt").isNotNull(),
                F.col("__t") - F.col("__pt"),
            )
        ).alias("__span"),
        F.max("__t").alias("last_fetch_time"),
        F.max_by("__d", F.struct("__t", "__d")).alias("last_digest"),
    )
    n = F.col("n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    mean_iv = F.col("__span") / n
    rate = F.when(
        (F.col("n_intervals") > 0) & (mean_iv > 0),
        -F.log((n - x + 0.5) / (n + 0.5)) / mean_iv,
    )
    return per_url.select(
        "url", "n_fetches", "n_intervals", "n_changes",
        F.round(mean_iv, 6).alias("mean_interval_s"),
        F.round(rate, 12).alias("change_rate"),
        "last_fetch_time", "last_digest",
    )


def staleness_probability(rate, age_s) -> "Column":
    """P(content changed since the last fetch): 1 − exp(−λ·age)."""
    rate = F.col(rate) if isinstance(rate, str) else rate
    age_s = F.col(age_s) if isinstance(age_s, str) else age_s
    return F.lit(1.0) - F.exp(-rate * F.greatest(age_s, F.lit(0.0)))


def schedule_revisits(
    rates: DataFrame,
    now_s: float,
    budget: int | None = None,
    min_staleness: float | None = None,
    prior_rate: float | None = None,
) -> DataFrame:
    """The revisit list: ``(url, change_rate, age_s, staleness_p)``
    ordered most-stale-first (url ascending on ties, so rounds are
    reproducible), optionally floored at ``min_staleness`` and capped
    at ``budget`` rows (one TakeOrdered — no global sort
    materializes when capped).

    ``prior_rate`` fills urls with no interval evidence (single
    fetch) so fresh discoveries still age into revisits; with no
    prior they are EXCLUDED — scheduling on zero evidence is a
    policy the caller must opt into. ``now_s`` is the caller's clock
    (epoch seconds), passed in rather than read here so replays and
    tests are deterministic."""
    rate = F.coalesce(
        F.col("change_rate"),
        F.lit(prior_rate).cast("double"),
    )
    age = F.lit(float(now_s)) - F.col("last_fetch_time")
    out = (
        rates.select(
            "url",
            F.round(rate, 12).alias("change_rate"),
            F.round(age, 6).alias("age_s"),
            F.round(
                staleness_probability(rate, age), 6
            ).alias("staleness_p"),
        )
        .filter(F.col("staleness_p").isNotNull())
    )
    if min_staleness is not None:
        out = out.filter(F.col("staleness_p") >= min_staleness)
    out = out.orderBy(F.desc("staleness_p"), F.asc("url"))
    return out.limit(budget) if budget is not None else out
