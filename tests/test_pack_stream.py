"""Streaming packing: per-batch sequences match the batch pipeline on
the same rows, token conservation across the landed dataset, composite
identity uniqueness, replay idempotence (re-running a batch id
regenerates its partition identically), and checkpointed resume."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
    materialize_sequences,
    pack_sequences,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.pack_stream import (
    pack_batch,
    read_packed_dataset,
    start_packing_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _docs(spark, id_start, n):
    return spark.range(id_start, id_start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(
                F.concat(F.lit("w"), F.col("id")),
                (F.pmod(F.col("id"), 7) + 1).cast("int"),
            ),
        ).alias("text"),
    )


def test_stream_packs_batches_and_resumes(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "packed")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, 0, 200).coalesce(1).write.parquet(str(src / "a.parquet"))
    _docs(spark, 1000, 150).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )
    start_packing_stream(
        spark, str(src) + "/*", SCHEMA, out, budget=32, n_shards=4,
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    ).awaitTermination(180)

    ds = read_packed_dataset(spark, out)
    batches = {r["ingest_batch"] for r in ds.select("ingest_batch").collect()}
    assert batches == {0, 1}
    # composite identity is unique
    assert (
        ds.groupBy("ingest_batch", "shard", "seq_id").count()
        .filter("count > 1").count() == 0
    )
    # token conservation: landed seq_tokens == input token mass
    total = ds.agg(F.sum("seq_tokens")).collect()[0][0]
    want = (
        _docs(spark, 0, 200).unionByName(_docs(spark, 1000, 150))
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n")).collect()[0][0]
    )
    assert total == want

    # each batch's partition equals the batch pipeline on the same rows
    for bid, (s, n) in {0: (0, 200), 1: (1000, 150)}.items():
        got = {
            (r["shard"], r["seq_id"], r["seq_text"])
            for r in ds.filter(F.col("ingest_batch") == bid).collect()
        }
        want_rows = materialize_sequences(
            pack_sequences(_docs(spark, s, n), 32, n_shards=4)
        ).collect()
        assert got == {
            (r["shard"], r["seq_id"], r["seq_text"]) for r in want_rows
        }

    # resume with nothing new: no partitions added
    start_packing_stream(
        spark, str(src) + "/*", SCHEMA, out, budget=32, n_shards=4,
        checkpoint_dir=ckpt,
    ).awaitTermination(120)
    assert {
        r["ingest_batch"]
        for r in read_packed_dataset(spark, out).select("ingest_batch").collect()
    } == {0, 1}


def test_replay_rewrites_identically(spark, tmp_path):
    out = str(tmp_path / "packed")
    batch = _docs(spark, 0, 120)
    pack_batch(batch, 3, out, budget=40, n_shards=4)
    first = sorted(
        map(str, read_packed_dataset(spark, out).collect())
    )
    pack_batch(batch, 3, out, budget=40, n_shards=4)  # at-least-once
    assert sorted(map(str, read_packed_dataset(spark, out).collect())) == first
