"""Dialog assembly pins: gap boundaries split exactly where inactivity
exceeds the gap, turns come back in time order, per-speaker
independence, agreement with q39's engine sessionization on counts,
and layout determinism."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
    assemble_dialogs,
)


def _ts(minute, second=0):
    return datetime(2026, 3, 1, 10, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two dialogs (gap of 40 min between minute 5 and 45)
        (1, _ts(0), "msg", 1.0),
        (1, _ts(2), "msg", 2.0),
        (1, _ts(5), "msg", 3.0),
        (1, _ts(45), "msg", 4.0),
        (1, _ts(46), "msg", 5.0),
        # user 2: one dialog, exactly-at-gap boundary stays together
        (2, _ts(0), "msg", 10.0),
        (2, _ts(30), "msg", 11.0),
    ]
    return spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "value"]
    )


def test_gap_boundaries_and_turn_order(events):
    out = assemble_dialogs(events, gap_seconds=1800).collect()
    by = {(r["user_id"], r["dialog_id"]): r for r in out}
    assert set(by) == {(1, 0), (1, 1), (2, 0)}
    d0 = by[(1, 0)]
    assert d0["n_turns"] == 3
    assert [t["value"] for t in d0["turns"]] == [1.0, 2.0, 3.0]
    assert d0["dialog_start"] == _ts(0) and d0["dialog_end"] == _ts(5)
    d1 = by[(1, 1)]
    assert [t["value"] for t in d1["turns"]] == [4.0, 5.0]
    # a gap of EXACTLY gap_seconds does not split (strict >)
    assert by[(2, 0)]["n_turns"] == 2


def test_layout_deterministic_and_validated(spark, events):
    a = sorted(
        (r["user_id"], r["dialog_id"], tuple(t["value"] for t in r["turns"]))
        for r in assemble_dialogs(events, 1800).collect()
    )
    b = sorted(
        (r["user_id"], r["dialog_id"], tuple(t["value"] for t in r["turns"]))
        for r in assemble_dialogs(events.repartition(5), 1800).collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        assemble_dialogs(events, 0)


def test_counts_agree_with_engine_sessionization(spark, sf_dir):
    """Same gap, same data: dialog (count, total turns) per user match
    q39's session_window aggregation."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.windows import (
        session_aggregate,
    )

    ev = load_table(spark, sf_dir, "events")
    ours = (
        assemble_dialogs(ev, gap_seconds=1800)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_dialogs"),
            F.sum("n_turns").alias("n_events"),
        )
    )
    theirs = (
        session_aggregate(ev, "30 minutes")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_dialogs"),
            F.sum("n_events").alias("n_events"),
        )
    )
    diff = ours.exceptAll(theirs)
    assert diff.count() == 0
    assert ours.count() == theirs.count()


def test_render_dialogs_and_packing_handoff(spark, events):
    """Rendered text preserves turn order and the role template, and
    the output packs like any other document table."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        render_dialogs,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        pack_sequences,
    )

    d = render_dialogs(assemble_dialogs(events, 1800))
    rows = {(r["user_id"], r["dialog_id"]): r for r in d.collect()}
    assert rows[(1, 0)]["dialog_text"] == (
        "msg: 1.0\nmsg: 2.0\nmsg: 3.0"
    )
    assert rows[(2, 0)]["dialog_text"] == "msg: 10.0\nmsg: 11.0"
    docs = d.select(
        F.concat_ws("#", "user_id", "dialog_id").alias("doc_id"),
        F.col("dialog_text").alias("text"),
    )
    packed = pack_sequences(docs, budget=16, n_shards=2)
    assert packed.count() == 3
    assert packed.filter("seq_offset >= 16").count() == 0


def test_stream_assembly_batch_parity_and_emission(spark, events, tmp_path):
    """The streaming twin: identical (user, ordered-turn-values) sets
    on the same batch data, and in a real stream a finalized dialog
    emits once, complete and ordered, after the watermark passes."""
    import json

    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        assemble_dialogs_stream,
    )

    def turn_sets(df):
        return sorted(
            (r["user_id"], tuple(t["value"] for t in r["turns"]))
            for r in df.collect()
        )

    assert turn_sets(assemble_dialogs_stream(events, "30 minutes")) == (
        turn_sets(assemble_dialogs(events, 1800))
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def feed(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    feed(
        "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01 00:02:00", "event_type": "m", "value": 2.0},
            {"user_id": 1, "ts": "2024-01-01 00:00:00", "event_type": "m", "value": 1.0},
        ],
    )
    # a much-later event closes user 1's session past the watermark
    feed(
        "b2.json",
        [{"user_id": 1, "ts": "2024-01-01 03:00:00", "event_type": "m", "value": 9.0}],
    )
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string, value double"
    ).option("maxFilesPerTrigger", 1).json(str(landing))
    q = (
        assemble_dialogs_stream(
            stream.withWatermark("ts", "10 minutes"), "30 minutes"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.read.parquet(out).collect()
    finalized = [r for r in emitted if r["n_turns"] == 2]
    assert len(finalized) == 1
    assert [t["value"] for t in finalized[0]["turns"]] == [1.0, 2.0]


def test_oversized_dialog_guard_fires(spark, events):
    """A never-idle speaker (every event under the gap) makes one
    corpus-sized dialog; the in-plan guard must fail loudly by size
    instead of funneling it through one collect task — and the bound
    leaves normal dialogs untouched."""
    with pytest.raises(Exception, match="max_turns_per_dialog"):
        assemble_dialogs(
            events, gap_seconds=1800, max_turns_per_dialog=2
        ).collect()
    ok = assemble_dialogs(
        events, gap_seconds=1800, max_turns_per_dialog=3
    ).collect()
    assert len(ok) == 3  # largest dialog has exactly 3 turns


def test_oversized_dialog_guard_streaming(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        assemble_dialogs_stream,
    )

    rows = [(1, _ts(0, s), "msg", float(s)) for s in range(5)]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "value"]
    )
    # batch execution of the streaming-shaped plan: the post-agg assert
    with pytest.raises(Exception, match="max_turns_per_dialog"):
        assemble_dialogs_stream(
            ev, "30 minutes", max_turns_per_dialog=4
        ).collect()
    ok = assemble_dialogs_stream(
        ev, "30 minutes", max_turns_per_dialog=5
    ).collect()
    assert len(ok) == 1 and ok[0]["n_turns"] == 5


def test_oversized_dialog_error_names_the_key(spark, events):
    """The guard's error must NAME the offending speaker and dialog
    (the collected_group_max_rows contract): at scale the operator
    needs the key in hand to filter the pathological speaker upstream,
    not just the count."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        assemble_dialogs_stream,
    )

    with pytest.raises(
        Exception, match=r"user_id=1 dialog_id=\d+ has"
    ):
        assemble_dialogs(
            events, gap_seconds=1800, max_turns_per_dialog=2
        ).collect()

    rows = [(7, _ts(0, s), "msg", float(s)) for s in range(5)]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "value"]
    )
    with pytest.raises(Exception, match=r"user_id=7 dialog_start="):
        assemble_dialogs_stream(
            ev, "30 minutes", max_turns_per_dialog=4
        ).collect()


def test_streaming_dead_letter_mode_routes_instead_of_wedging(spark):
    """on_oversized='dead_letter': the oversized dialog is truncated to
    the bound and flagged instead of poisoning the micro-batch, so the
    caller can route it to a reject sink while the stream keeps
    running; normal dialogs pass through unflagged and untruncated."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        assemble_dialogs_stream,
    )

    rows = [(1, _ts(0, s), "msg", float(s)) for s in range(6)] + [
        (2, _ts(0, s), "msg", float(s)) for s in range(2)
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_type", "value"]
    )
    got = {
        r["user_id"]: r
        for r in assemble_dialogs_stream(
            ev, "30 minutes", max_turns_per_dialog=4,
            on_oversized="dead_letter",
        ).collect()
    }
    big, small = got[1], got[2]
    assert big["oversized"] is True
    assert big["n_turns"] == 6  # true count survives truncation
    assert [t["value"] for t in big["turns"]] == [0.0, 1.0, 2.0, 3.0]
    assert small["oversized"] is False
    assert small["n_turns"] == 2
    assert len(small["turns"]) == 2

    with pytest.raises(ValueError, match="fail | dead_letter"):
        assemble_dialogs_stream(ev, on_oversized="explode")


def test_upstream_cap_bounds_dialog_state_pre_materialization(
    spark, tmp_path
):
    """The documented composition for bounding streaming dialog state
    BEFORE it materializes: cap_events_per_key chained into the
    session agg in ONE streaming query. A never-idle speaker's turns
    are cut at the gate (across micro-batches — the cap is stateful),
    so the session state never holds more than the cap; other speakers
    pass untouched."""
    import json

    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        assemble_dialogs_stream,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.quota import (
        cap_events_per_key,
    )

    landing = tmp_path / "in"
    landing.mkdir()

    def feed(name, rows):
        (landing / name).write_text(
            "\n".join(json.dumps(r) for r in rows)
        )

    def ev(uid, minute, v):
        return {
            "user_id": uid,
            "ts": f"2024-01-01 00:{minute:02d}:00",
            "event_type": "m",
            "value": float(v),
        }

    # the bot (user 1) spans two micro-batches: 2 events then 4 more;
    # the human (user 2) sends 2. cap=3 must admit exactly the bot's
    # first three ACROSS batches (state persists), all of the human's.
    feed("a.json", [ev(1, 0, 0), ev(1, 1, 1), ev(2, 0, 10)])
    feed("b.json", [ev(1, 2, 2), ev(1, 3, 3), ev(1, 4, 4), ev(2, 1, 11)])
    # a far-future closer pushes the watermark past everyone's gap
    feed("z.json", [ev(3, 0, 99) | {"ts": "2024-01-01 06:00:00"}])

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    gated = cap_events_per_key(
        stream.withWatermark("ts", "10 minutes"), "user_id", 3
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        assemble_dialogs_stream(
            gated.withWatermark("ts", "10 minutes"), "30 minutes"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: [t["value"] for t in r["turns"]]
        for r in spark.read.parquet(out).collect()
    }
    assert got[1] == [0.0, 1.0, 2.0]  # capped at 3, across batches
    assert got[2] == [10.0, 11.0]  # untouched

    with pytest.raises(ValueError, match="must be > 0"):
        cap_events_per_key(stream, "user_id", 0)


from hypothesis import HealthCheck, given, settings, strategies as st

_ev = st.lists(
    st.tuples(
        st.integers(0, 2),    # user
        st.integers(0, 120),  # ts offset in minutes
        st.integers(0, 3),    # value tag
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(_ev, st.sampled_from([600, 1800, 3600]))
def test_assemble_dialogs_matches_python_model(spark, events, gap_seconds):
    """Differential model check of the gaps-and-islands assembly:
    random per-user event streams (including exact ts duplicates)
    replayed through a plain Python sessionizer — sort by (ts, turn
    cols), break when the gap is EXCEEDED (boundary is strict >), and
    carry the member turns — must equal the operator's dialogs row for
    row: same boundaries, same n_turns, same ordered turn arrays."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(minutes=m), "m", float(v))
        for u, m, v in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    got = sorted(
        (
            r["user_id"],
            r["dialog_id"],
            r["n_turns"],
            tuple(
                (t["ts"].replace(tzinfo=None), t["value"])
                for t in r["turns"]
            ),
        )
        for r in assemble_dialogs(df, gap_seconds=gap_seconds).collect()
    )

    want = []
    for u in {u for u, _, _ in events}:
        evs = sorted(
            (base + datetime.timedelta(minutes=m), "m", float(v))
            for uu, m, v in events
            if uu == u
        )
        sessions, cur = [], [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if (nxt[0] - prev[0]).total_seconds() > gap_seconds:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for i, sess in enumerate(sessions):
            want.append(
                (
                    u,
                    i,
                    len(sess),
                    tuple((ts, v) for ts, _, v in sess),
                )
            )
    assert got == sorted(want), (events, gap_seconds)


def test_render_spans_slice_back_to_turn_texts(spark):
    """The loss-mask record: every span sliced out of dialog_text
    reproduces its turn's text exactly (multi-char separators, empty
    texts, multi-byte role names included), and loss_spans keeps only
    the requested roles in order."""
    rows = [
        (1, _ts(0, 0), "user", "hello there"),
        (1, _ts(0, 1), "assistant", "hi!"),
        (1, _ts(0, 2), "user", ""),
        (1, _ts(0, 3), "assistant", "bye été"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value string"
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
        render_dialogs_with_spans,
    )

    d = assemble_dialogs(ev, gap_seconds=3600)
    out = render_dialogs_with_spans(
        d, turn_sep="\n\n", role_sep=">> ", loss_roles=["assistant"]
    ).collect()[0]
    text = out["dialog_text"]
    texts = [t["value"] for t in out["turns"]]
    roles = [t["event_type"] for t in out["turns"]]
    assert [s["role"] for s in out["spans"]] == roles
    for s, want in zip(out["spans"], texts):
        assert text[s["text_start"]:s["text_end"]] == want
    assert [s["role"] for s in out["loss_spans"]] == [
        "assistant", "assistant",
    ]
    got_loss = [
        text[s["text_start"]:s["text_end"]] for s in out["loss_spans"]
    ]
    assert got_loss == ["hi!", "bye été"]
