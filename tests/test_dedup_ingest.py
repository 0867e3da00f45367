"""Streaming exact-dedup ingest: cross-batch rejection through the
growing index, in-batch keeper rule, per-batch stats, conservation,
and checkpointed resume."""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.streaming.dedup_ingest import (
    start_dedup_ingest_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_dedup_ingest_end_to_end(spark, tmp_path):
    table = "dedup_ingest_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    src = tmp_path / "src"
    src.mkdir()
    good = str(tmp_path / "good")
    reject = str(tmp_path / "reject")
    stats = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    start_dedup_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table, good, reject, ckpt,
        stats_path=stats, buckets=4,
    ).awaitTermination(120)

    g0 = {r["doc_id"] for r in spark.read.parquet(good).collect()}
    assert g0 == {1, 2}  # in-batch dup 3 rejected, keeper 1
    r0 = {r["doc_id"]: r["keeper_id"] for r in spark.read.parquet(reject).collect()}
    assert r0 == {3: 1}

    # batch 1: one cross-batch dup (alpha again), one fresh
    spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_dedup_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table, good, reject, ckpt,
        stats_path=stats, buckets=4,
    ).awaitTermination(120)

    good_df = spark.read.parquet(good)
    reject_df = spark.read.parquet(reject)
    assert {r["doc_id"] for r in good_df.collect()} == {1, 2, 11}
    keepers = {r["doc_id"]: r["keeper_id"] for r in reject_df.collect()}
    assert keepers == {3: 1, 10: 1}
    # conservation: every input row in exactly one zone
    assert good_df.count() + reject_df.count() == 5
    # the index carries one row per distinct admitted text
    assert spark.table(table).count() == 3

    st = {
        r["ingest_batch"]: r for r in spark.read.parquet(stats).collect()
    }
    assert st[0]["n_admitted"] == 2 and st[0]["n_duplicates"] == 1
    assert st[1]["n_admitted"] == 1 and st[1]["n_duplicates"] == 1
    assert abs(st[1]["dup_ratio"] - 0.5) < 1e-9

    # restart with nothing new: no reprocessing anywhere
    start_dedup_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table, good, reject, ckpt,
        stats_path=stats, buckets=4,
    ).awaitTermination(120)
    assert spark.read.parquet(good).count() == 3
    assert spark.table(table).count() == 3
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_replay_of_indexed_batch_is_stable(spark, tmp_path):
    """Regression: re-delivering an already-indexed batch used to
    reclassify EVERY row as a duplicate of itself (its own id is the
    corpus keeper now), rewriting the reject zone and stats row as
    all-duplicates. Replay must reproduce the original good/reject
    split and stats."""
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.dedup_ingest import (
        ingest_batch_with_dedup,
    )

    table = "dedup_replay_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    good = str(tmp_path / "good")
    reject = str(tmp_path / "reject")
    stats = str(tmp_path / "stats")
    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], SCHEMA
    )

    def snapshot():
        g = {r["doc_id"] for r in spark.read.parquet(good).collect()}
        d = {
            (r["doc_id"], r["keeper_id"])
            for r in spark.read.parquet(reject).collect()
        }
        s = spark.read.parquet(stats).collect()[0]
        return g, d, (s["n_admitted"], s["n_duplicates"], s["dup_ratio"])

    ingest_batch_with_dedup(
        batch, 0, table, good, reject, stats_path=stats, buckets=4
    )
    first = snapshot()
    assert first[0] == {1, 2} and first[1] == {(3, 1)}
    # at-least-once re-delivery of the SAME batch (same batch_id)
    ingest_batch_with_dedup(
        batch, 0, table, good, reject, stats_path=stats, buckets=4
    )
    assert snapshot() == first
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_resend_same_doc_new_batch_is_rejected_e2e(spark, tmp_path):
    """The wiring pin for the batch-scoped replay exemption: the SAME
    document (same id, same text) re-delivered by the upstream in a
    LATER micro-batch must land in the reject zone as a duplicate of
    its own corpus copy — never in a second good-zone partition."""
    table = "dedup_ingest_resend_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    src = tmp_path / "src"
    src.mkdir()
    good = str(tmp_path / "good")
    reject = str(tmp_path / "reject")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    start_dedup_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table, good, reject, ckpt,
        buckets=4,
    ).awaitTermination(120)

    # the upstream re-sends doc 1 verbatim under a NEW batch
    spark.createDataFrame(
        [(1, "alpha"), (3, "gamma")], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_dedup_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table, good, reject, ckpt,
        buckets=4,
    ).awaitTermination(120)

    good_rows = spark.read.parquet(good).collect()
    # doc 1's text exists exactly ONCE across the good zone
    assert sorted(
        (r["doc_id"], r["ingest_batch"]) for r in good_rows
    ) == [(1, 0), (2, 0), (3, 1)]
    rejects = {
        (r["doc_id"], r["ingest_batch"]): r["keeper_id"]
        for r in spark.read.parquet(reject).collect()
    }
    assert rejects == {(1, 1): 1}  # duplicate of its own corpus copy
    spark.sql(f"DROP TABLE IF EXISTS {table}")
