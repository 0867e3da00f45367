"""Streaming DSIR gate (streaming/dsir_gate.py): streamed scores match
the batch scorer against the same frozen ratio table, the threshold
mode drops-and-counts, and checkpoint resume processes only new files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators.dsir import (
    build_ratio_table,
    dsir_importance,
    hashed_ngram_profile,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.dsir_gate import (
    start_dsir_gate_stream,
)

B = 64

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BATCH_A = [(1, "spark shuffle exchange"), (2, "pasta with garlic")]
BATCH_B = [(3, "spark broadcast join"), (4, "garlic butter pasta")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


@pytest.fixture()
def ratio_table(spark):
    name = "dsir_gate_test_ratios"
    target = _docs(spark, [(100, "spark shuffle broadcast join")])
    raw = _docs(spark, BATCH_A + BATCH_B)
    build_ratio_table(
        hashed_ngram_profile(target, n_buckets=B),
        hashed_ngram_profile(raw, n_buckets=B),
        name,
        n_buckets=B,
    )
    yield name
    spark.sql(f"drop table if exists {name}")


def test_streamed_scores_match_batch_scorer(spark, tmp_path, ratio_table):
    src = tmp_path / "src"
    src.mkdir()
    out, stats = str(tmp_path / "out"), str(tmp_path / "stats")
    _docs(spark, BATCH_A).coalesce(1).write.parquet(str(src / "a.parquet"))
    _docs(spark, BATCH_B).coalesce(1).write.parquet(str(src / "b.parquet"))
    start_dsir_gate_stream(
        spark, str(src) + "/*", DOCS_SCHEMA, ratio_table, out,
        str(tmp_path / "ckpt"), stats_path=stats, n_buckets=B,
    ).awaitTermination(120)

    got = {
        r.doc_id: r.dsir_logw for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: r.dsir_logw
        for r in dsir_importance(
            _docs(spark, BATCH_A + BATCH_B),
            spark.table(ratio_table),
            n_buckets=B,
        ).collect()
    }
    assert got == want
    srows = spark.read.parquet(stats).collect()
    assert sum(r.n_docs for r in srows) == 4
    assert all(r.n_kept == r.n_docs for r in srows)  # score-and-carry
    # spark-themed docs outscore pasta docs through the whole chain
    assert min(got[1], got[3]) > max(got[2], got[4])


def test_threshold_mode_drops_and_counts(spark, tmp_path, ratio_table):
    src = tmp_path / "src"
    src.mkdir()
    out, stats = str(tmp_path / "out"), str(tmp_path / "stats")
    _docs(spark, BATCH_A + BATCH_B).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    # scores on this fixture (smoothing-dominated, all negative):
    # spark-themed ≈ -0.95, pasta-themed ≈ -4.4/-5.1 — the gate sits
    # between the classes
    start_dsir_gate_stream(
        spark, str(src) + "/*", DOCS_SCHEMA, ratio_table, out,
        str(tmp_path / "ckpt"), stats_path=stats, threshold=-2.0,
        n_buckets=B,
    ).awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}  # only the target-like docs clear the gate
    srow = spark.read.parquet(stats).collect()[0]
    assert (srow.n_docs, srow.n_kept) == (4, 2)
    assert srow.logw_min < -2.0 < srow.logw_max


def test_checkpoint_resume_processes_only_new_files(
    spark, tmp_path, ratio_table
):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, BATCH_A).coalesce(1).write.parquet(str(src / "a.parquet"))
    start_dsir_gate_stream(
        spark, str(src) + "/*", DOCS_SCHEMA, ratio_table, out, ckpt,
        n_buckets=B,
    ).awaitTermination(120)
    first = {
        (r.doc_id, r.ingest_batch)
        for r in spark.read.parquet(out).select(
            "doc_id", F.col("ingest_batch")
        ).collect()
    }
    _docs(spark, BATCH_B).coalesce(1).write.parquet(str(src / "b.parquet"))
    start_dsir_gate_stream(
        spark, str(src) + "/*", DOCS_SCHEMA, ratio_table, out, ckpt,
        n_buckets=B,
    ).awaitTermination(120)
    after = {
        (r.doc_id, r.ingest_batch)
        for r in spark.read.parquet(out).select(
            "doc_id", F.col("ingest_batch")
        ).collect()
    }
    assert first <= after  # old partitions untouched
    assert {d for d, _ in after} == {1, 2, 3, 4}
    assert len({b for _, b in after}) == 2  # new file = new batch only


def test_incremental_dsir_recipe_end_to_end(spark, tmp_path):
    """The documented refresh loop across all the DSIR pieces: raw
    docs stream into the ngram profile LEDGER; a ratio table is built
    from profile_so_far + the target profile; the GATE stream scores a
    fresh feed against that frozen table; grouped Gumbel selection
    draws per-source budgets from the scored zone. Scores through the
    whole loop equal the one-shot batch path."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.dsir import (
        dsir_log_ratios,
        dsir_select,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.stat_ledgers import (
        profile_so_far,
        start_ngram_profile_ledger_stream,
    )

    raw_src = tmp_path / "raw"
    raw_src.mkdir()
    led = str(tmp_path / "led")
    _docs(spark, BATCH_A).coalesce(1).write.parquet(
        str(raw_src / "a.parquet")
    )
    _docs(spark, BATCH_B).coalesce(1).write.parquet(
        str(raw_src / "b.parquet")
    )
    start_ngram_profile_ledger_stream(
        spark, str(raw_src) + "/*", DOCS_SCHEMA, led, n_buckets=B,
        checkpoint_dir=str(tmp_path / "ck1"),
    ).awaitTermination(120)

    target = _docs(spark, [(100, "spark shuffle broadcast join")])
    table = "dsir_recipe_test_ratios"
    build_ratio_table(
        hashed_ngram_profile(target, n_buckets=B),
        profile_so_far(spark, led),
        table,
        n_buckets=B,
    )
    try:
        feed = tmp_path / "feed"
        feed.mkdir()
        out = str(tmp_path / "scored")
        fresh = [(11, "spark shuffle tricks"), (12, "garlic pasta oven")]
        _docs(spark, fresh).coalesce(1).write.parquet(
            str(feed / "f.parquet")
        )
        start_dsir_gate_stream(
            spark, str(feed) + "/*", DOCS_SCHEMA, table, out,
            str(tmp_path / "ck2"), n_buckets=B,
        ).awaitTermination(120)
        got = {
            r.doc_id: r.dsir_logw
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r.doc_id: r.dsir_logw
            for r in dsir_importance(
                _docs(spark, fresh),
                dsir_log_ratios(
                    hashed_ngram_profile(target, n_buckets=B),
                    hashed_ngram_profile(
                        _docs(spark, BATCH_A + BATCH_B), n_buckets=B
                    ),
                    n_buckets=B,
                ),
                n_buckets=B,
            ).collect()
        }
        assert got == want
        assert got[11] > got[12]
        picked = dsir_select(
            spark.read.parquet(out).withColumn(
                "src", (F.col("doc_id") % 2).cast("string")
            ),
            n=1,
            group_col="src",
        ).collect()
        assert len(picked) == 2  # one per source budget
    finally:
        spark.sql(f"drop table if exists {table}")
