"""Funnel analysis over event streams: per user, how far through an
ORDERED step sequence (A then B then C …) did they get, each step
strictly at-or-after the previous match — the product-analytics
operator (activation funnels, onboarding drop-off) the events table
exists for.

Semantics, stated precisely (the greedy-earliest matching every
analytics engine uses):

- step 1 matches the user's EARLIEST step-1 event; step k+1 matches
  the earliest step-(k+1) event with ``ts >= step k's match``
  (``>=``: same-timestamp progress counts — deterministic because the
  match is a min over timestamps, not a row pick);
- ``within_seconds`` bounds the WHOLE funnel: step k only matches
  while ``ts − step-1 ts <= within_seconds`` (the campaign-window
  reading; per-edge timeouts are a different dial, not this one);
- greedy-earliest is the standard and SAFE choice for unbounded
  funnels (matching later step-1 events can never reach fewer steps),
  and the documented convention under a window (a user who misses the
  window from their first A but would convert from a later A reports
  the first — the conservative reading).

Plan shape: filter to funnel-step events only (pushed to the scan),
ONE user-keyed aggregation collecting the (ts, step) pairs, and a
row-local sorted fold computing the chain — the `dialogs.py` /
sessionization stance: per-user arrays bounded by per-user FUNNEL
activity (already filtered to the k step types), not corpus size.
No window functions, no joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per user who emitted at least one step-1 event:
    (user, steps_completed, step_ts: array<timestamp> — the matched
    timestamp per completed step)."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be distinct event types")
    step_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    slim = (
        events.filter(F.col(type_col).isin(*steps))
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                step_idx[F.col(type_col)].alias("step"),
            ).alias("__e"),
        )
    )
    collected = slim.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e")).alias("__es")
    )
    # fold: acc = (next step to match, matched timestamps so far)
    zero = F.struct(
        F.lit(0).alias("want"),
        F.array().cast("array<timestamp>").alias("hits"),
    )
    k = len(steps)
    horizon = (
        F.lit(None).cast("double")
        if within_seconds is None
        else F.lit(float(within_seconds))
    )

    def step_fn(acc, e):
        in_window = (
            F.lit(True)
            if within_seconds is None
            else (
                (F.size(acc["hits"]) == 0)
                | (
                    e["ts"].cast("double")
                    - F.element_at(acc["hits"], 1).cast("double")
                    <= horizon
                )
            )
        )
        matches = (
            (acc["want"] < k) & (e["step"] == acc["want"]) & in_window
        )
        return F.struct(
            F.when(matches, acc["want"] + 1)
            .otherwise(acc["want"])
            .alias("want"),
            F.when(
                matches, F.concat(acc["hits"], F.array(e["ts"]))
            )
            .otherwise(acc["hits"])
            .alias("hits"),
        )

    folded = F.aggregate(F.col("__es"), zero, step_fn)
    return (
        collected.select(
            F.col(user_col),
            folded["want"].cast("long").alias("steps_completed"),
            folded["hits"].alias("step_ts"),
        )
        .filter(F.col("steps_completed") > 0)
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-step rollup: (step, event_type, n_users, conversion_from_
    start, conversion_from_prev) — the drop-off table. Operand after
    the per-user funnel is user-sized, the rollup is k rows."""
    f = funnel(
        events, steps, user_col, type_col, ts_col, within_seconds
    )
    counts = (
        f.groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_completed = {r["steps_completed"]: r["n"] for r in counts}
    k = len(steps)
    reached = []
    running = 0
    for step in range(k, 0, -1):
        running += by_completed.get(step, 0)
        reached.append((step, running))
    reached.reverse()
    spark = events.sparkSession
    base = reached[0][1]
    rows = []
    prev = None
    for step, n in reached:
        rows.append(
            (
                step,
                steps[step - 1],
                n,
                round(n / base, 6) if base else 0.0,
                round(n / prev, 6) if prev else 1.0,
            )
        )
        prev = n
    return spark.createDataFrame(
        rows,
        "step int, event_type string, n_users long, "
        "conversion_from_start double, conversion_from_prev double",
    )
