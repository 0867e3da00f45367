"""Per-source streaming token quotas (streaming/quota.py): budget
enforcement, cross-micro-batch state carry, and the unlimited default.
The transformWithState twin is exercised only where its protobuf
dependency exists (absent in this container — module docstring)."""

from __future__ import annotations

import json
import os

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.streaming.quota import (
    OUTPUT_SCHEMA,
    TokenQuotaProcessor,
    apply_token_quota,
)

SCHEMA = "source STRING, doc_id BIGINT, n_tokens BIGINT"


def _write_batch(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, landing, out_dir, ckpt, budgets, default=-1):
    stream = spark.readStream.schema(SCHEMA).json(landing)
    gated = apply_token_quota(stream, budgets, default_budget=default)
    q = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}


def test_quota_admits_until_budget_and_carries_state(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # batch 1: s1 uses 8 of its 10-token budget; s2 is unlimited
    _write_batch(landing, "b1.json", [
        {"source": "s1", "doc_id": 1, "n_tokens": 8},
        {"source": "s2", "doc_id": 2, "n_tokens": 500},
    ])
    got = _run(spark, landing, out, ckpt, {"s1": 10})
    assert got[1].admitted and got[1].budget_used == 8
    assert got[2].admitted and got[2].budget_used == 500

    # batch 2: s1 has 2 tokens left -> the 5-token doc is dropped whole,
    # the later 2-token doc still fits (documents never split)
    _write_batch(landing, "b2.json", [
        {"source": "s1", "doc_id": 3, "n_tokens": 5},
        {"source": "s1", "doc_id": 4, "n_tokens": 2},
        {"source": "s2", "doc_id": 5, "n_tokens": 999},
    ])
    got = _run(spark, landing, out, ckpt, {"s1": 10})
    assert not got[3].admitted and got[3].budget_used == 8
    assert got[4].admitted and got[4].budget_used == 10
    assert got[5].admitted   # default budget unlimited


def test_quota_zero_budget_drops_everything(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_batch(landing, "b1.json", [
        {"source": "s1", "doc_id": i, "n_tokens": 3} for i in range(5)
    ])
    got = _run(
        spark, landing, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        {"s1": 0},
    )
    assert len(got) == 5
    assert all(not r.admitted and r.budget_used == 0 for r in got.values())


def test_tws_twin_where_protobuf_exists(spark, tmp_path):
    pytest.importorskip("google.protobuf")
    assert TokenQuotaProcessor is not None
    landing = str(tmp_path / "landing")
    _write_batch(landing, "b1.json", [
        {"source": "s1", "doc_id": 1, "n_tokens": 8},
        {"source": "s1", "doc_id": 2, "n_tokens": 8},
    ])
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(SCHEMA).json(landing)
        gated = stream.groupBy("source").transformWithStateInPandas(
            statefulProcessor=TokenQuotaProcessor({"s1": 10}),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
        q = (
            gated.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r.doc_id: r for r in
               spark.read.parquet(str(tmp_path / "out")).collect()}
        assert got[1].admitted != got[2].admitted  # exactly one fits
    finally:
        spark.conf.unset(key)


def test_quota_composes_with_split_assignment_on_stream(spark, tmp_path):
    """The streaming recipe chain: quota gate -> admitted filter ->
    deterministic split assignment, all inside one streaming query
    (assign_split is a pure projection, so it composes on streams
    unchanged — and the split a doc gets on the stream equals the split
    the same id gets in batch, the property the hash die exists for)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        assign_split,
    )

    landing = str(tmp_path / "landing")
    _write_batch(landing, "b1.json", [
        {"source": "s1", "doc_id": i, "n_tokens": 2} for i in range(20)
    ])
    stream = spark.readStream.schema(SCHEMA).json(landing)
    gated = apply_token_quota(stream, {"s1": 30})   # 15 of 20 docs fit
    recipe = assign_split(
        gated.filter("admitted"), {"train": 6.0, "val": 1.0, "test": 1.0}
    )
    q = (
        recipe.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert len(rows) == 15 and {r.split for r in rows} <= {"train", "val", "test"}
    # stream-assigned splits equal batch-assigned splits for the same ids
    batch = spark.createDataFrame(
        [(r.doc_id,) for r in rows], ["doc_id"]
    )
    want = {
        r.doc_id: r.split
        for r in assign_split(
            batch, {"train": 6.0, "val": 1.0, "test": 1.0}
        ).collect()
    }
    assert {r.doc_id: r.split for r in rows} == want


def test_quota_checkpoint_recovery_resumes_without_readmitting(
    spark, tmp_path
):
    """r4 verdict item 5: stop the query and restart from the SAME
    checkpoint — admission must resume from the persisted per-source
    state, not re-admit. Three phases on one checkpoint: (1) consume 8
    of a 10-token budget; (2) restart with NO new input — the already-
    processed file must not be reprocessed (exactly-once file source)
    and the ledger must not move; (3) restart with new input — the
    5-token doc no longer fits (proving `used=8` survived the restart,
    not reset to 0), the 2-token doc does, and the per-source
    budget_used sequence is monotone across the whole run."""
    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _write_batch(landing, "b1.json", [
        {"source": "s1", "doc_id": 1, "n_tokens": 8},
    ])
    got1 = _run(spark, landing, out, ckpt, {"s1": 10})
    assert got1[1].admitted and got1[1].budget_used == 8

    # phase 2: restart, zero new input — output must be unchanged
    got2 = _run(spark, landing, out, ckpt, {"s1": 10})
    assert len(got2) == 1 and got2[1].budget_used == 8

    # phase 3: restart with new input — a fresh state would wrongly
    # admit the 5-token doc (5 <= 10); recovered state (used=8) must
    # drop it whole and admit only the 2-token doc
    _write_batch(landing, "b2.json", [
        {"source": "s1", "doc_id": 3, "n_tokens": 5},
        {"source": "s1", "doc_id": 4, "n_tokens": 2},
    ])
    got3 = _run(spark, landing, out, ckpt, {"s1": 10})
    assert not got3[3].admitted and got3[3].budget_used == 8
    assert got3[4].admitted and got3[4].budget_used == 10
    ledger = [got3[i].budget_used for i in (1, 3, 4)]
    assert ledger == sorted(ledger)  # monotone across restarts
    # the recovered state lives in the checkpoint's state store
    assert os.path.isdir(os.path.join(ckpt, "state"))


def test_cap_events_per_key_checkpoint_recovery(spark, tmp_path):
    """The per-key event cap survives a restart: with cap=3 and 2
    events admitted before the stop, a restart admits exactly ONE more
    for that key (a reset state would admit three) and drops the rest;
    a fresh key is unaffected by the old key's state."""
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.quota import (
        cap_events_per_key,
    )

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).json(landing)
        q = (
            cap_events_per_key(stream, "source", 3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.source, r.doc_id)
            for r in spark.read.parquet(out).collect()
        )

    _write_batch(landing, "b1.json", [
        {"source": "k1", "doc_id": 1, "n_tokens": 1},
        {"source": "k1", "doc_id": 2, "n_tokens": 1},
    ])
    assert run() == [("k1", 1), ("k1", 2)]

    _write_batch(landing, "b2.json", [
        {"source": "k1", "doc_id": 3, "n_tokens": 1},
        {"source": "k1", "doc_id": 4, "n_tokens": 1},
        {"source": "k1", "doc_id": 5, "n_tokens": 1},
        {"source": "k2", "doc_id": 6, "n_tokens": 1},
    ])
    got = run()
    k1 = [d for s, d in got if s == "k1"]
    assert len(k1) == 3  # 2 admitted before the restart + exactly 1 after
    assert ("k2", 6) in got  # fresh key admits independently
