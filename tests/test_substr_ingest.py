"""Streaming exact-substring ingest: new docs land cut against the
growing gram index, cross-batch repeats generate retro-span ledger
rows over the landed docs, replay of an indexed batch is stable, and
`apply_retro_spans` settles the ledger at compaction."""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators.substr_dedup import (
    exact_substr_against_index,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.substr_ingest import (
    apply_retro_spans,
    start_substr_ingest_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

SHARED = "<<this exact forty-plus character promo block repeats>>"
K = 30


def _start(spark, src, table, tmp, **kw):
    return start_substr_ingest_stream(
        spark, str(src) + "/*", SCHEMA, table,
        str(tmp / "good"), str(tmp / "retro"), str(tmp / "ckpt"),
        k=K, spans_path=str(tmp / "spans"),
        stats_path=str(tmp / "stats"), buckets=4, **kw,
    )


def test_substr_ingest_end_to_end(spark, tmp_path):
    table = "substr_ingest_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    src = tmp_path / "src"
    src.mkdir()

    # batch 0: two docs sharing SHARED (in-batch repeat), one clean
    spark.createDataFrame(
        [
            (1, "first unique body " + SHARED + " first tail"),
            (2, "second head " + SHARED + " second unique tail"),
            (3, "a completely unrelated document body"),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    _start(spark, src, table, tmp_path).awaitTermination(120)

    good = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "good")).collect()
    }
    assert set(good) == {1, 2, 3}
    # the in-batch repeat is cut from BOTH carriers at the door
    assert "promo block" not in good[1]
    assert "promo block" not in good[2]
    assert "first unique body" in good[1]
    assert good[3] == "a completely unrelated document body"
    # no corpus existed yet → no retro debt (an all-empty dynamic
    # overwrite writes no partition files at all)
    import glob

    assert not glob.glob(str(tmp_path / "retro" / "**" / "*.parquet"),
                         recursive=True)

    # batch 1: doc 10 repeats doc 3's text mid-body (cross-batch)
    spark.createDataFrame(
        [(10, "prefix " + "a completely unrelated document body" + " suffix")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    _start(spark, src, table, tmp_path).awaitTermination(120)

    good = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "good")).collect()
    }
    # the new copy was cut at the door...
    assert "unrelated" not in good[10]
    assert good[10].startswith("prefix ")
    # ...and the landed original now owes a retro span covering it
    retro = spark.read.parquet(str(tmp_path / "retro")).collect()
    assert {r.doc_id for r in retro} == {3}
    (r3,) = retro
    assert r3.span_start == 1 and r3.span_length == len(
        "a completely unrelated document body"
    )

    # settle the ledger: the corpus copy is cut too (the spans audit
    # zone rides along as the door-cut coordinate base)
    settled = {
        r.doc_id: r.text
        for r in apply_retro_spans(
            spark.read.parquet(str(tmp_path / "good")).drop("ingest_batch"),
            spark.read.parquet(str(tmp_path / "retro")),
            door_spans=spark.read.parquet(str(tmp_path / "spans")),
        ).collect()
    }
    assert settled[3] == ""
    assert settled[1] == good[1]  # no ledger row, untouched

    st = {
        r.ingest_batch: r
        for r in spark.read.parquet(str(tmp_path / "stats")).collect()
    }
    assert st[0].n_docs == 3 and st[0].n_spans_cut == 2
    assert st[0].n_retro_spans == 0
    assert st[1].n_retro_spans == 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_replay_of_indexed_batch_is_stable(spark, tmp_path):
    """Re-running a batch id whose grams are already indexed (crash
    after index append, before checkpoint commit) classifies
    identically: the replay exemption hides the batch's own index
    rows, so nothing self-marks."""
    table = "substr_replay_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "one clean body with no repeats anywhere inside it")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    _start(spark, src, table, tmp_path).awaitTermination(120)
    first = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "good")).collect()
    }
    assert "no repeats" in first[1]

    # simulate the replay: call the batch classifier again with the
    # SAME batch id against the already-appended index
    from data_pipeline_project_using_telegram_and_aws_spark.operators.substr_dedup import (
        exact_substr_against_index as probe,
    )

    batch = spark.createDataFrame(
        [(1, "one clean body with no repeats anywhere inside it")], SCHEMA
    )
    cleaned, spans, retro = probe(spark, batch, table, K, batch_id=0)
    assert spans.count() == 0 and retro.count() == 0
    assert cleaned.collect()[0].text == first[1]
    # under a NEW batch id the same bytes self-match: copy cut,
    # original owes retro
    cleaned2, spans2, retro2 = exact_substr_against_index(
        spark, batch.selectExpr("cast(9 as long) as doc_id", "text"),
        table, K, batch_id=1,
    )
    assert cleaned2.collect()[0].text == ""
    assert retro2.collect()[0].doc_id == 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_retro_spans_translate_through_door_cuts(spark, tmp_path):
    """The landed doc was ITSELF cut at its own admission: retro
    spans (original coordinates) must translate through the door cuts
    before settling, or the wrong bytes are deleted. Batch 0 lands
    A = P+X and B = P+Y (P repeats in-batch, cut from both); batch 1
    brings C containing X → retro span for A in ORIGINAL coordinates.
    Settlement with the spans zone removes exactly X from A's landed
    text (leaving the empty string); without translation it would
    leave a prefix of X behind."""
    table = "substr_door_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    src = tmp_path / "src"
    src.mkdir()
    P = "shared-prefix-paragraph repeated across both documents!"
    X = "unique continuation for document A long enough to match"
    Y = "a different continuation for document B with other words"
    assert len(P) >= K and len(X) >= K
    spark.createDataFrame(
        [(1, P + X), (2, P + Y)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    _start(spark, src, table, tmp_path).awaitTermination(120)
    good = {
        r.doc_id: r.text
        for r in spark.read.parquet(str(tmp_path / "good")).collect()
    }
    assert good[1] == X and good[2] == Y  # P cut at the door

    spark.createDataFrame(
        [(9, "zz " + X + " tail")], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    _start(spark, src, table, tmp_path).awaitTermination(120)
    retro = spark.read.parquet(str(tmp_path / "retro")).collect()
    assert {r.doc_id for r in retro} == {1}
    (r1,) = retro
    # original coordinates: X begins after P
    assert r1.span_start == len(P) + 1 and r1.span_length == len(X)

    settled = {
        r.doc_id: r.text
        for r in apply_retro_spans(
            spark.read.parquet(str(tmp_path / "good")).drop("ingest_batch"),
            spark.read.parquet(str(tmp_path / "retro")),
            door_spans=spark.read.parquet(str(tmp_path / "spans")),
        ).collect()
    }
    assert settled[1] == ""   # X fully removed from the landed text
    assert settled[2] == Y    # untouched
    spark.sql(f"DROP TABLE IF EXISTS {table}")
