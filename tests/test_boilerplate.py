"""DF-based boilerplate line removal: ubiquitous lines vanish from
every document (not just non-first copies — the contrast with span
dedup), rare lines survive byte-identically in order, thresholds
compose as max(min_docs, frac·n), blank lines are immune, all-
boilerplate docs keep their row, the pass is idempotent, and the hot
set rides a broadcast join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.boilerplate import (
    boilerplate_report,
    remove_boilerplate_lines,
)

BANNER = "Accept all cookies"
FOOTER = "© Example Corp 2024"


def _corpus(spark):
    rows = []
    for i in range(20):
        body = f"unique content line {i}\nsecond thought {i * 7}"
        # banner in 18/20 docs (90%), footer in 12/20 (60%),
        # a shared-but-rare line in 3/20 (15%)
        parts = []
        if i < 18:
            parts.append(f"  {BANNER}  ")  # whitespace variants match
        parts.append(body)
        if i < 12:
            parts.append(FOOTER)
        if i < 3:
            parts.append("shared rare line")
        rows.append((i, "\n".join(parts)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ubiquitous_lines_removed_everywhere(spark):
    docs = _corpus(spark)
    out = remove_boilerplate_lines(docs, min_docs=5, frac=0.5)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert len(texts) == 20  # row contract
    joined = "\n".join(texts.values())
    assert BANNER not in joined  # gone from EVERY doc, incl. doc 0
    assert FOOTER not in joined
    assert "shared rare line" in texts[0]  # below threshold → kept
    # survivors byte-identical in order
    assert texts[19] == "unique content line 19\nsecond thought 133"
    drops = {r["doc_id"]: r["n_dropped_lines"] for r in out.collect()}
    assert drops[0] == 2 and drops[15] == 1 and drops[19] == 0


def test_min_docs_floor_guards_small_corpora(spark):
    docs = spark.createDataFrame(
        [(1, "same\na"), (2, "same\nb")], "doc_id long, text string"
    )
    # frac=0.5 alone would flag "same" (df=2 of 2); the floor saves it
    out = remove_boilerplate_lines(docs, min_docs=5, frac=0.5)
    assert all("same" in r["text"] for r in out.collect())


def test_all_boilerplate_doc_keeps_row_and_idempotence(spark):
    docs = _corpus(spark).unionByName(
        # doc 100 is ONLY the banner + footer
        _corpus(spark)
        .sparkSession.createDataFrame(
            [(100, f"{BANNER}\n{FOOTER}")], "doc_id long, text string"
        )
    )
    out = remove_boilerplate_lines(docs, min_docs=5, frac=0.5)
    row = {r["doc_id"]: r for r in out.collect()}[100]
    assert row["text"] == "" and row["n_dropped_lines"] == 2
    # second pass over the output is a no-op
    again = remove_boilerplate_lines(out, min_docs=5, frac=0.5)
    assert {(r["doc_id"], r["text"]) for r in again.collect()} == {
        (r["doc_id"], r["text"]) for r in out.select(
            "doc_id", "text"
        ).collect()
    }
    assert again.agg(F.sum("n_dropped_lines")).collect()[0][0] == 0


def test_blank_lines_never_drop(spark):
    docs = spark.createDataFrame(
        [(i, f"content {i}\n\nmore {i}") for i in range(10)],
        "doc_id long, text string",
    )
    out = remove_boilerplate_lines(docs, min_docs=2, frac=0.1)
    assert all("\n\n" in r["text"] for r in out.collect())


def test_report_and_plan(spark):
    docs = _corpus(spark)
    rep = {
        r["line"]: (r["line_df"], r["doc_share"])
        for r in boilerplate_report(docs, min_docs=5, frac=0.5).collect()
    }
    assert rep[BANNER] == (18, 0.9)
    assert rep[FOOTER] == (12, 0.6)
    assert "shared rare line" not in rep
    plan = (
        remove_boilerplate_lines(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # hot set broadcast, never SMJ
    with pytest.raises(ValueError, match="frac"):
        remove_boilerplate_lines(docs, frac=0.0)


def test_within_doc_dedup_is_doc_scoped_and_shuffle_free(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.boilerplate import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [
            # repeated nav block inside one page; whitespace variant
            (1, "Home | About\nreal content\n  Home | About \nmore text"),
            # the same line in ANOTHER doc is untouched (doc-scoped)
            (2, "Home | About\nother content"),
            # repeated blank lines survive; repeated content drops
            (3, "para one\n\npara one\n\npara two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_within_doc(docs).collect()}
    assert out[1]["text"] == "Home | About\nreal content\nmore text"
    assert out[1]["n_dropped_lines"] == 1
    assert out[2]["text"] == "Home | About\nother content"
    assert out[2]["n_dropped_lines"] == 0
    assert out[3]["text"] == "para one\n\n\npara two"
    assert out[3]["n_dropped_lines"] == 1
    # idempotent
    again = dedup_lines_within_doc(dedup_lines_within_doc(docs))
    assert again.agg(F.sum("n_dropped_lines")).collect()[0][0] == 0
    # pure projection: no Exchange anywhere in the plan
    plan = (
        dedup_lines_within_doc(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_incremental_ledger_cumulative_threshold_and_replay(spark, tmp_path):
    """The daily-batch boilerplate shape: a banner rare within each
    single day but ubiquitous across days drops only under the
    CUMULATIVE ledger (the per-batch threshold structurally misses
    it); single-pass parity on the merged corpus; at-least-once replay
    of a batch partition is a rewrite, not a double count."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.boilerplate import (
        remove_boilerplate_against_ledger,
        update_line_df_ledger,
    )

    led = str(tmp_path / "ledger")
    # 3 days × 4 docs; the banner appears in 3 docs per day (75% of
    # each day, 9/12 overall) — but with min_docs=5 no single day can
    # clear the floor alone; cumulatively it must
    days = []
    for d in range(3):
        rows = [
            (d * 10 + i, f"{BANNER}\nday {d} body {i}" if i < 3 else f"day {d} body {i}")
            for i in range(4)
        ]
        days.append(
            spark.createDataFrame(rows, "doc_id long, text string")
        )
    for d, batch in enumerate(days):
        update_line_df_ledger(batch, led, d)

    # day-2 batch cleaned against the full ledger: banner (df=9 ≥
    # max(5, ceil(0.5*12)=6)) drops everywhere
    out = remove_boilerplate_against_ledger(
        days[2], led, min_docs=5, frac=0.5
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert all(BANNER not in t for t in texts.values())
    assert texts[23] == "day 2 body 3"  # untouched doc intact
    # but against only day 2's own ledger slice the banner survives
    led1 = str(tmp_path / "one_day")
    update_line_df_ledger(days[2], led1, 0)
    solo = remove_boilerplate_against_ledger(
        days[2], led1, min_docs=5, frac=0.5
    )
    assert any(BANNER in r["text"] for r in solo.collect())

    # replay: re-landing day 1's partition leaves cumulative counts
    # unchanged (rewrite, not append)
    before = spark.read.parquet(led).count()
    n_docs_before = (
        spark.read.parquet(led)
        .filter(F.col("line_key").isNull())
        .agg(F.sum("n_docs")).collect()[0][0]
    )
    update_line_df_ledger(days[1], led, 1)
    assert spark.read.parquet(led).count() == before
    assert (
        spark.read.parquet(led)
        .filter(F.col("line_key").isNull())
        .agg(F.sum("n_docs")).collect()[0][0] == n_docs_before
    )
    assert n_docs_before == 12
