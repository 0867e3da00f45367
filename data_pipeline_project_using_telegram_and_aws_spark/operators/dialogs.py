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
streaming twin cannot window before its stateful agg, so it checks
``n_turns`` after — loud assert by default (a poison pill for the
stream, documented on the function), or the opt-in ``dead_letter``
mode that flags-and-truncates so oversized dialogs route to a reject
sink instead of wedging the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _default_max_turns() -> int:
    from ..functions.scale_rules import collected_group_max_rows

    # a turn struct carries text — budget ~256 B/turn → ~262k turns
    return collected_group_max_rows(bytes_per_row=256)


def _turns_assert(
    n: Column, bound: int, keys: list[tuple[str, Column]]
) -> Column:
    """Loud bound check naming the offending group — the
    `collected_group_max_rows` contract ("oversized keys fail loudly
    with the key named", matching funnel's `_guard_per_user_collect`):
    at scale the operator needs the speaker/dialog in the error to
    filter the pathological key upstream, not just the count."""
    named = []
    for name, col in keys:
        named.append(F.lit(f"{name}="))
        named.append(F.coalesce(col.cast("string"), F.lit("NULL")))
        named.append(F.lit(" "))
    return F.assert_true(
        n <= F.lit(bound),
        F.concat(
            F.lit("assemble_dialogs: dialog "),
            *named,
            F.lit("has "),
            n.cast("string"),
            F.lit(
                f" turns > max_turns_per_dialog={bound}; the per-dialog "
                "collect_list materializes the whole conversation in "
                "one task - filter the named speaker upstream, raise "
                "the bound only with the "
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
            _turns_assert(
                F.col("__dn"),
                max_turns_per_dialog,
                [(by, F.col(by)), ("dialog_id", F.col("dialog_id"))],
            ).isNull()
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
    on_oversized: str = "fail",
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
    session only finalizes after the gap closes.

    Oversized dialogs, honestly: no pre-agg window exists in streaming
    (the session state IS the grouping), so the bound is checked AFTER
    the array has materialized. ``on_oversized``:

    - ``"fail"`` (default): assert_true raises, naming speaker and
      dialog start. WEDGE WARNING, stated explicitly: in a running
      stream this is a poison pill — the failing micro-batch never
      commits its checkpoint, a restart re-finalizes the same session
      and fails again, and the stream stays down until the bound is
      raised in code. Pick this when an oversized dialog means the
      pipeline is misconfigured and MUST stop.
    - ``"dead_letter"``: no assert; rows gain an ``oversized`` boolean
      and oversized dialogs keep only their first ``max_turns``
      turns (``n_turns`` still reports the true count). The stream
      keeps running; route ``oversized`` rows to a reject sink in the
      caller's foreachBatch/filter — the dead-letter path for the
      never-idle-speaker case.

    Either way the state for a pathological never-idle speaker grows
    until the session closes; to bound state BEFORE materialization,
    gate upstream with `streaming/quota.cap_events_per_key` — it
    chains into this operator's session agg in ONE streaming query
    (append-mode applyInPandasWithState followed by a stateful agg is
    a supported combination; pinned in tests), so the capped
    speaker's turns never enter the session state at all."""
    if on_oversized not in ("fail", "dead_letter"):
        raise ValueError(
            "assemble_dialogs_stream: on_oversized must be "
            "fail | dead_letter"
        )
    cols = turn_cols or ["event_type", "value"]
    if max_turns_per_dialog is None:
        max_turns_per_dialog = _default_max_turns()
    turn = F.struct(F.col(ts_col).alias("ts"), *[F.col(c) for c in cols])
    agged = events.groupBy(
        F.col(by), F.session_window(F.col(ts_col), gap).alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_sort(F.collect_list(turn)).alias("turns"),
    )
    if on_oversized == "fail":
        agged = agged.filter(
            _turns_assert(
                F.col("n_turns"),
                max_turns_per_dialog,
                [(by, F.col(by)), ("dialog_start", F.col("sw.start"))],
            ).isNull()
        )
        return agged.select(
            by,
            F.col("sw.start").alias("dialog_start"),
            F.col("sw.end").alias("dialog_end"),
            "n_turns",
            "turns",
        )
    over = F.col("n_turns") > F.lit(max_turns_per_dialog)
    return agged.select(
        by,
        F.col("sw.start").alias("dialog_start"),
        F.col("sw.end").alias("dialog_end"),
        "n_turns",
        F.when(
            over, F.slice(F.col("turns"), 1, max_turns_per_dialog)
        )
        .otherwise(F.col("turns"))
        .alias("turns"),
        over.alias("oversized"),
    )


def render_dialogs_with_spans(
    dialogs: DataFrame,
    role_col: str = "event_type",
    text_col: str = "value",
    turn_sep: str = "\n",
    role_sep: str = ": ",
    loss_roles: list[str] | None = None,
) -> DataFrame:
    """:func:`render_dialogs` plus the SFT loss-masking record: a
    ``spans`` column — one struct per turn with the turn's role and
    the 0-based character offsets ``[text_start, text_end)`` of its
    TEXT (the part after ``role: ``) inside ``dialog_text`` — and,
    when ``loss_roles`` is given, ``loss_spans`` filtered to those
    roles (the assistant-turns-only mask an SFT trainer feeds its
    loss). Character offsets, stated plainly: token-level masks
    belong to the tokenizer stage — any tokenizer that reports
    character offset mappings composes; slicing ``dialog_text`` by a
    span reproduces the turn text exactly (pinned).

    Plan: one row-local ``aggregate`` fold over the turns array
    (running offset + span list — no shuffle, no Python), then the
    same ``array_join`` render as :func:`render_dialogs`; the two are
    built from the same parts so text and offsets cannot drift."""
    sep_len = len(turn_sep)
    rsep_len = len(role_sep)

    role_str = lambda t: t[role_col].cast("string")
    text_str = lambda t: t[text_col].cast("string")
    line_len = lambda t: (
        F.length(role_str(t)) + rsep_len + F.length(text_str(t))
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array().cast(
            "array<struct<role:string,text_start:long,text_end:long>>"
        ).alias("spans"),
    )

    def fold(acc, t):
        # a turn after the first is preceded by the separator
        start = acc["off"] + F.when(
            F.size(acc["spans"]) > 0, F.lit(sep_len)
        ).otherwise(F.lit(0))
        text_start = start + F.length(role_str(t)) + rsep_len
        text_end = text_start + F.length(text_str(t))
        span = F.struct(
            role_str(t).alias("role"),
            text_start.cast("long").alias("text_start"),
            text_end.cast("long").alias("text_end"),
        )
        return F.struct(
            text_end.cast("long").alias("off"),
            F.concat(acc["spans"], F.array(span)).alias("spans"),
        )

    rendered = render_dialogs(
        dialogs, role_col, text_col, turn_sep, role_sep
    ).withColumn(
        "spans", F.aggregate(F.col("turns"), zero, fold)["spans"]
    )
    if loss_roles is not None:
        rendered = rendered.withColumn(
            "loss_spans",
            F.filter(
                F.col("spans"),
                lambda s: s["role"].isin(*loss_roles),
            ),
        )
    return rendered
