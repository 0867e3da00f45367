"""Mergeable frequency ledger: count-min sketch + guaranteed-recall
heavy hitters.

The frequency complement to the HLL/theta (distinct) and bottom-k
(quantile) ledgers: "how often has token/domain/url X appeared across
the whole corpus so far?" asked exactly is a corpus-sized keyed
aggregation whose result table is vocabulary-sized — rescanned and
reshuffled every time the question changes. The count-min sketch
(Cormode & Muthukrishnan 2005) inverts the cost the same way the other
ledgers do: each day/batch reduces in one pass to a FIXED-SIZE state —
``depth × width`` counters — and

- **merge is lossless**: CMS(A ⊎ B) = CMS(A) + CMS(B) element-wise
  (counter addition), so per-day ledger rows sum into all-time rows
  with no approximation added by the merge (pinned exactly in tests);
- **estimates are one-sided**: est(x) ≥ true(x) always, and
  est(x) ≤ true(x) + εN with probability ≥ 1−δ, where ε = e/width,
  δ = e^−depth, N = total mass. Overcounts only — a CMS never hides a
  heavy item, it can only promote a light one.

Representation: LONG format, one row per (group, row, bucket) counter
— schema ``(by…, r, bucket, cnt)`` — because Spark aggregates rows
natively: the build is ONE partial-agg'd aggregation (map-side combine
shrinks every partition to ≤ depth·width counters before the shuffle),
the merge is a groupBy-sum over ledger rows, and a point query is a
broadcast join of the (tiny) query set against depth rows per item.
Zero counters are simply absent rows (the sketch is sparse until the
data fills it) — ``estimate_counts`` coalesces misses to 0.

Heavy hitters with NO false negatives: an item with all-time mass
≥ φ·N must carry ≥ φ·N/d average mass per day over d days, so on at
least one day its share of that day's mass is ≥ φ/d (pigeonhole, since
every day's mass ≤ N). Harvesting each day's exact top items above the
φ/d day-share (a day-bounded aggregation — the day IS scanned once
anyway to build its sketch row) therefore catches every true heavy
hitter; the merged CMS then scores the candidate union and the final
filter keeps est ≥ φ·N. One-sided both ways: recall is guaranteed,
precision is bounded by the CMS overcount (≤ εN with prob 1−δ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_DEPTH = 4     # δ = e^-4 ≈ 1.8%
DEFAULT_WIDTH = 2048  # ε = e/2048 ≈ 0.13% of total mass
_SEED = 0x5EED


def cms_ledger(
    df: DataFrame,
    item_col: str,
    by: list[str] | None = None,
    weight_col: str | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build count-min rows ``(by…, r, bucket, cnt)`` over ``item_col``
    (optionally ``weight_col``-weighted — e.g. token counts instead of
    document counts). One exploded projection + one partial-agg'd
    aggregation; state is ≤ depth·width rows per group regardless of
    corpus size."""
    if depth < 1 or width < 2:
        raise ValueError("cms_ledger: need depth >= 1 and width >= 2")
    keys = list(by or [])
    wcol = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    probes = df.select(
        *keys,
        F.col(item_col).cast("string").alias("__item"),
        wcol.alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.xxhash64(F.col("__item"), F.col("r"), F.lit(_SEED)),
            F.lit(width),
        ),
    )
    return probes.groupBy(*keys, "r", "bucket").agg(
        F.sum("__w").alias("cnt")
    )


def merge_cms_ledger(
    ledger: DataFrame, by: list[str] | None = None
) -> DataFrame:
    """Sum counters across ledger rows — CMS merge is element-wise
    addition, exactly. With ``by=None`` groups collapse into one
    all-time sketch. Ledger-sized operand; raw data never rescans."""
    keys = list(by or [])
    return ledger.groupBy(*keys, "r", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def estimate_counts(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """(item, est): the CMS point estimate — min over the depth rows —
    for each (distinct) item in ``items``. The sketch (≤ depth·width
    rows, bounded by construction) BROADCASTS; the query set streams
    through one hash join + one item-keyed aggregation — nothing
    corpus-sized anywhere. est ≥ true always; absent counters read
    0."""
    probes = (
        items.select(F.col(item_col).cast("string").alias("item"))
        .distinct()
        .select(
            "item",
            F.explode(
                F.sequence(F.lit(0), F.lit(depth - 1))
            ).alias("r"),
        )
        .withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(F.col("item"), F.col("r"), F.lit(_SEED)),
                F.lit(width),
            ),
        )
    )
    joined = probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    day_col: str,
    phi: float,
    weight_col: str | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """(item, est, share_est): every item whose all-time mass is
    ≥ ``phi`` of the total — guaranteed recall (see module docstring's
    pigeonhole argument), precision bounded by the CMS overcount.

    Plan: each day's scan feeds two day-bounded aggregations — its
    sketch rows and its exact candidate harvest. The vocabulary-scale
    work is therefore confined to single-day aggregations (which any
    per-day ingest already pays); the ALL-TIME state is sketch-sized,
    cross-day merges never touch a vocabulary-sized operand, and the
    candidate union is ≤ days²/phi items by construction (each day
    yields ≤ d/φ items above the φ/d day-share)."""
    if not 0.0 < phi <= 1.0:
        raise ValueError("heavy_hitters: phi must be in (0, 1]")
    wcol = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    slim = df.select(
        F.col(day_col).alias("__day"),
        F.col(item_col).cast("string").alias("item"),
        wcol.alias("__w"),
    )
    n_days = slim.select("__day").distinct().count()
    if n_days == 0:
        return slim.select(
            "item",
            F.lit(0).cast("long").alias("est"),
            F.lit(0.0).alias("share_est"),
        ).limit(0)
    # per-day exact counts → candidates above the φ/d day share
    day_counts = slim.groupBy("__day", "item").agg(
        F.sum("__w").alias("c")
    )
    day_mass = day_counts.groupBy("__day").agg(F.sum("c").alias("m"))
    candidates = (
        day_counts.join(F.broadcast(day_mass), "__day")
        .filter(F.col("c") >= F.col("m") * F.lit(phi / n_days))
        .select("item")
        .distinct()
    )
    sketch = merge_cms_ledger(
        cms_ledger(
            slim, "item", by=["__day"], weight_col="__w",
            depth=depth, width=width,
        )
    )
    total = slim.agg(F.sum("__w").alias("n")).collect()[0]["n"] or 0
    floor = phi * total
    return (
        estimate_counts(sketch, candidates, depth=depth, width=width)
        .filter(F.col("est") >= F.lit(floor))
        .withColumn("share_est", F.col("est") / F.lit(float(total)))
    )
