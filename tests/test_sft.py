"""SFT record assembly: covering segments reproduce the rendered text
byte for byte, any per-segment tokenizer composes, the reassembled
mask is True exactly on loss-role tokens, and the per-record token
guard fails loudly with the dialog named."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.dialogs import (
    assemble_dialogs,
    render_dialogs_with_spans,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.sft import (
    explode_loss_segments,
    reassemble_sft_records,
)


def _rendered(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(minutes=m), role, txt)
        for m, (role, txt) in enumerate(
            [
                ("user", "hello big world"),
                ("assistant", "hi there"),
                ("user", ""),
                ("assistant", "bye now"),
            ]
        )
    ] + [
        (2, base, "user", "solo"),
        (2, base + datetime.timedelta(minutes=1), "assistant", "ok"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value string"
    )
    return render_dialogs_with_spans(
        assemble_dialogs(ev, gap_seconds=3600), turn_sep="\n", role_sep=": "
    )


def test_segments_cover_text_exactly(spark):
    rendered = _rendered(spark)
    segs = explode_loss_segments(
        rendered, loss_roles=["assistant"]
    ).orderBy("user_id", "seg_idx")
    by_user: dict = {}
    for r in segs.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    texts = {
        r["user_id"]: r["dialog_text"] for r in rendered.collect()
    }
    for uid, rows in by_user.items():
        assert "".join(r["seg_text"] for r in rows) == texts[uid]
        # chrome rows carry no role and never train
        for r in rows:
            if r["role"] is None:
                assert not r["is_loss"]
            else:
                assert r["is_loss"] == (r["role"] == "assistant")
    # the empty user turn contributed no segment
    assert all(r["seg_text"] != "" for rows in by_user.values() for r in rows)


def test_reassembled_mask_aligns_with_tokens(spark):
    rendered = _rendered(spark)
    segs = explode_loss_segments(rendered, loss_roles=["assistant"])
    # any tokenizer composes; whitespace split is the test's stand-in
    tok = segs.withColumn(
        "token_ids",
        F.filter(F.split("seg_text", r"\s+"), lambda p: p != ""),
    )
    rec = {
        r["user_id"]: r
        for r in reassemble_sft_records(tok).collect()
    }
    r1 = rec[1]
    assert r1["n_tokens"] == len(r1["token_ids"]) == len(r1["loss_mask"])
    trainable = [
        t for t, m in zip(r1["token_ids"], r1["loss_mask"]) if m
    ]
    assert trainable == ["hi", "there", "bye", "now"]
    assert r1["n_loss_tokens"] == 4
    masked = [
        t for t, m in zip(r1["token_ids"], r1["loss_mask"]) if not m
    ]
    # chrome + user turns: role headers train nowhere
    assert "user:" in masked and "assistant:" in masked
    assert {"hello", "big", "world"} <= set(masked)
    r2 = rec[2]
    assert [
        t for t, m in zip(r2["token_ids"], r2["loss_mask"]) if m
    ] == ["ok"]


def test_token_guard_names_the_dialog(spark):
    rendered = _rendered(spark)
    segs = explode_loss_segments(rendered, loss_roles=["assistant"])
    tok = segs.withColumn(
        "token_ids", F.split("seg_text", r"\s+")
    )
    with pytest.raises(Exception, match=r"user_id=\d+ dialog_id=0 has"):
        reassemble_sft_records(tok, max_tokens_per_record=2).collect()


def test_sft_records_pack_with_masks_intact(spark):
    """The full handoff: SFT records (tokens + mask) pack like any
    documents (whole records, never split) and materialize into fixed-
    budget sequences whose flattened mask stays parallel to the tokens
    — the trainable token multiset is conserved end to end."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        materialize_token_sequences,
        pack_sequences,
    )

    rendered = _rendered(spark)
    segs = explode_loss_segments(rendered, loss_roles=["assistant"])
    tok = segs.withColumn(
        "token_ids",
        F.filter(F.split("seg_text", r"\s+"), lambda p: p != ""),
    )
    recs = reassemble_sft_records(tok).withColumn(
        "record_id",
        F.concat_ws("/", "user_id", "dialog_id"),
    )
    packed = pack_sequences(
        recs, budget=8, n_shards=2, id_col="record_id",
        n_tokens_col="n_tokens",
    )
    seqs = materialize_token_sequences(
        packed, mask_col="loss_mask"
    ).collect()
    assert len(seqs) >= 1
    for r in seqs:
        assert len(r["token_ids"]) == len(r["loss_mask"]) == r["n_tokens"]
    packed_trainable = sorted(
        t
        for r in seqs
        for t, m in zip(r["token_ids"], r["loss_mask"])
        if m
    )
    want_trainable = sorted(
        t
        for r in recs.collect()
        for t, m in zip(r["token_ids"], r["loss_mask"])
        if m
    )
    assert packed_trainable == want_trainable == sorted(
        ["hi", "there", "bye", "now", "ok"]
    )


def test_eval_leakage_gate_before_sft_assembly(spark):
    """The chat-data eval-leakage recipe: rendered dialogs decontaminate
    against the benchmark set EXACTLY like documents (dialog_text is a
    document), and the flagged dialog never reaches SFT assembly — its
    turns containing the benchmark prompt are gone from the training
    records while clean dialogs pass untouched."""
    import datetime

    from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
        contamination_report,
    )

    base = datetime.datetime(2024, 1, 1)
    bench_prompt = (
        "what is the capital of the country directly north of spain"
    )
    rows = [
        (1, base, "user", bench_prompt),           # leaked benchmark item
        (1, base + datetime.timedelta(minutes=1), "assistant", "paris"),
        (2, base, "user", "tell me about parquet row groups please"),
        (2, base + datetime.timedelta(minutes=1), "assistant", "sure"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value string"
    )
    rendered = render_dialogs_with_spans(
        assemble_dialogs(ev, gap_seconds=3600)
    ).withColumn(
        "dialog_key",
        F.concat_ws("/", "user_id", "dialog_id"),
    )
    # contamination_report's id/text column names apply to BOTH sides
    bench = spark.createDataFrame(
        [("bench/100", bench_prompt)],
        "dialog_key string, dialog_text string",
    )
    hits = contamination_report(
        rendered, bench, n=8, id_col="dialog_key", text_col="dialog_text"
    )
    contaminated = {r["train_doc_id"] for r in hits.collect()}
    assert contaminated == {"1/0"}

    clean = rendered.join(
        hits.select(
            F.col("train_doc_id").alias("dialog_key")
        ).distinct(),
        "dialog_key",
        "left_anti",
    )
    segs = explode_loss_segments(clean, loss_roles=["assistant"])
    tok = segs.withColumn(
        "token_ids",
        F.filter(F.split("seg_text", r"\s+"), lambda p: p != ""),
    )
    recs = reassemble_sft_records(tok).collect()
    assert [r["user_id"] for r in recs] == [2]
    all_tokens = {t for r in recs for t in r["token_ids"]}
    assert "spain" not in all_tokens and "capital" not in all_tokens
