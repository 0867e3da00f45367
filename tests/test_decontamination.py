from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
    contamination_report,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            # verbatim copy of eval doc 100 (full contamination)
            (0, "the quick brown fox jumps over the lazy dog"),
            # shares one 4-gram window with eval doc 101
            (1, "alpha beta gamma delta epsilon zeta"),
            # clean
            (2, "completely unrelated text with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    eval_docs = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "zero alpha beta gamma delta nine eight"),
        ],
        ["doc_id", "text"],
    )
    return train, eval_docs


def test_contamination_report(spark):
    train, eval_docs = _corpus(spark)
    rows = {
        (r["train_doc_id"], r["eval_doc_id"]): r
        for r in contamination_report(train, eval_docs, n=4).collect()
    }
    # doc 0 contains eval 100 verbatim: all 6 of its 4-grams collide
    full = rows[(0, 100)]
    assert full["shared_ngrams"] == 6 and full["eval_ngrams"] == 6
    assert full["contamination"] == 1.0
    # doc 1 shares exactly one 4-gram ("alpha beta gamma delta") with 101
    partial = rows[(1, 101)]
    assert partial["shared_ngrams"] == 1
    assert partial["contamination"] < 1.0
    # clean doc 2 appears in no pair
    assert not any(t == 2 for t, _ in rows)
    assert len(rows) == 2


def test_contamination_empty_on_disjoint_corpora(spark):
    train, eval_docs = _corpus(spark)
    clean = train.filter("doc_id = 2")
    assert contamination_report(clean, eval_docs, n=4).count() == 0


def test_incremental_contamination_matches_from_scratch(spark):
    """Daily-batch shape: the eval suite's grams persisted once
    (build_eval_gram_table), every training batch probed against the
    catalog table — row-identical to the from-scratch report, and the
    probe plan still broadcasts the eval side."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
        build_eval_gram_table,
        contamination_against_table,
    )

    train, eval_docs = _corpus(spark)
    build_eval_gram_table(eval_docs, "eval_grams_t", n=4)
    try:
        want = sorted(
            map(tuple, contamination_report(train, eval_docs, n=4).collect())
        )
        got_df = contamination_against_table(spark, train, "eval_grams_t", n=4)
        assert sorted(map(tuple, got_df.collect())) == want and want
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # a second "day" probes the same table without rebuilding it
        day2 = spark.createDataFrame(
            [(7, "the quick brown fox jumps over the lazy dog again")],
            ["doc_id", "text"],
        )
        got2 = contamination_against_table(spark, day2, "eval_grams_t", n=4)
        assert [r.eval_doc_id for r in got2.collect()] == [100]
    finally:
        spark.sql("DROP TABLE IF EXISTS eval_grams_t")
