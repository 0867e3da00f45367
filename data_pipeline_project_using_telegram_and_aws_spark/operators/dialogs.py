"""Dialog assembly: event/message streams → one row per conversation,
turns ordered and carried as an array of structs — the record shape a
chat/SFT corpus builder feeds the tokenizer (each dialog becomes one
training document), and the batch twin of the engine-stateful
sessionization `streaming/windows.session_aggregate` pins for q39.

Session boundary = inactivity gap per speaker-group (the classic
gaps-and-islands formulation, used here instead of ``session_window``
because assembly needs the MEMBER ROWS, not the merged aggregate):
``new_session = ts - lag(ts) > gap`` → session index = running sum of
boundaries. Two windows over one keyed shuffle (same partition key,
Catalyst reuses the sort), then one groupBy collecting (ts, turn)
structs sorted row-locally — array_sort on the struct, no second
shuffle. Dialog size is USUALLY bounded by the gap semantics (a
speaker's burst), but a pathological never-idle speaker (a bot
emitting events forever under the gap) makes one dialog corpus-sized
and the per-dialog ``collect_list`` would funnel it through one task
as a single un-spillable array — so the collect is guarded IN-PLAN
(``assert_true`` over a per-dialog count window, bound from
``scale_rules.collected_group_max_rows``; the window count spills,
the collect would not), same stance as `operators/funnel.py`. The
streaming twin cannot window before its stateful agg, so it asserts
on ``n_turns`` after — still loud, one dialog later.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _default_max_turns() -> int:
    from ..functions.scale_rules import collected_group_max_rows

    # a turn struct carries text — budget ~256 B/turn → ~262k turns
    return collected_group_max_rows(bytes_per_row=256)


def _turns_assert(n: Column, bound: int) -> Column:
    return F.assert_true(
        n <= F.lit(bound),
        F.concat_ws(
            " ",
            F.lit("assemble_dialogs: a dialog has"),
            n.cast("string"),
            F.lit(
                f"turns > max_turns_per_dialog={bound}; the per-dialog "
                "collect_list materializes the whole conversation in "
                "one task - raise the bound only with the "
                "scale_rules.collected_group_max_rows cost model in "
                "hand, or shorten the gap"
            ),
        ),
    )


def assemble_dialogs(
    events: DataFrame,
    gap_seconds: int,
    by: str = "user_id",
    ts_col: str = "ts",
    turn_cols: list[str] | None = None,
    max_turns_per_dialog: int | None = None,
) -> DataFrame:
    """One row per (speaker-group, dialog): ``dialog_id`` (dense per
    group), ``dialog_start``/``dialog_end``, ``n_turns``, and ``turns``
    — an array of structs (ts, *turn_cols) in time order. Ties on ts
    keep a deterministic order via the struct sort (ts first, then the
    turn columns' values). Oversized dialogs fail loudly in-plan
    (module docstring) at ``max_turns_per_dialog``."""
    if gap_seconds <= 0:
        raise ValueError("assemble_dialogs: gap_seconds must be > 0")
    if max_turns_per_dialog is None:
        max_turns_per_dialog = _default_max_turns()
    cols = turn_cols or ["event_type", "value"]
    order = Window.partitionBy(by).orderBy(ts_col, *cols)
    # unix_micros via a plain-timestamp cast handles both TZ flavors
    # (TIMESTAMP_NTZ refuses a direct numeric cast)
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0
    boundary = (
        F.when(sec - F.lag(sec).over(order) > gap_seconds, 1).otherwise(0)
    )
    run = Window.partitionBy(by).orderBy(ts_col, *cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessioned = events.withColumn("__b", boundary).withColumn(
        "dialog_id", F.sum("__b").over(run).cast("long")
    )
    turn = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in cols])
    # in-plan guard BEFORE the collect: the (by, dialog_id) count window
    # reuses the existing hash partitioning on `by` (a superset key
    # satisfies the clustering), so this costs a sort, not a shuffle;
    # filter-on-assert (isNull keeps all passing rows) is un-prunable
    sessioned = (
        sessioned.withColumn(
            "__dn",
            F.count(F.lit(1)).over(Window.partitionBy(by, "dialog_id")),
        )
        .filter(
            _turns_assert(F.col("__dn"), max_turns_per_dialog).isNull()
        )
        .drop("__dn")
    )
    return (
        sessioned.groupBy(by, "dialog_id")
        .agg(
            F.min(ts_col).alias("dialog_start"),
            F.max(ts_col).alias("dialog_end"),
            F.count(F.lit(1)).alias("n_turns"),
            F.array_sort(F.collect_list(turn)).alias("turns"),
        )
    )


def render_dialogs(
    dialogs: DataFrame,
    role_col: str = "event_type",
    text_col: str = "value",
    turn_sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """Flatten assembled dialogs into one training-ready text per
    conversation: ``role: text`` lines in turn order — the chat-template
    step between :func:`assemble_dialogs` and the tokenizer/packing
    stages (each rendered dialog is one document; ``n_turns`` rides
    along for length accounting). Row-local transform + array_join, no
    shuffle."""
    line = lambda t: F.concat(
        t[role_col].cast("string"), F.lit(role_sep), t[text_col].cast("string")
    )
    return dialogs.select(
        "*",
        F.array_join(
            F.transform(F.col("turns"), line), turn_sep
        ).alias("dialog_text"),
    )


def assemble_dialogs_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    turn_cols: list[str] | None = None,
    max_turns_per_dialog: int | None = None,
) -> DataFrame:
    """Streaming-compatible dialog assembly: the same record contract
    as :func:`assemble_dialogs` but built on the engine's gap-merged
    ``session_window`` state instead of gaps-and-islands windows (lag
    over an unbounded ordering has no streaming equivalent; session
    state does). Dialogs key on ``dialog_start`` rather than a dense
    per-speaker index — in an unbounded stream "the n-th dialog" is not
    a well-defined quantity, the start time is.

    Batch and streaming share this exact plan (the `windows.py`
    doctrine); in streaming add ``withWatermark(ts_col, ...)`` upstream
    and append mode emits each dialog once, when the watermark passes
    its gap — turns arrive complete and time-ordered because the
    session only finalizes after the gap closes."""
    cols = turn_cols or ["event_type", "value"]
    if max_turns_per_dialog is None:
        max_turns_per_dialog = _default_max_turns()
    turn = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in cols])
    return (
        events.groupBy(
            F.col(by), F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_sort(F.collect_list(turn)).alias("turns"),
        )
        # no pre-agg window exists in streaming (the session state IS
        # the grouping); assert after — the array already built, but
        # the job fails loudly with the size named instead of silently
        # shipping a corpus-sized dialog downstream
        .filter(
            _turns_assert(
                F.col("n_turns"), max_turns_per_dialog
            ).isNull()
        )
        .select(
            by,
            F.col("sw.start").alias("dialog_start"),
            F.col("sw.end").alias("dialog_end"),
            "n_turns",
            "turns",
        )
    )
