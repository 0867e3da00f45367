"""Trained char-n-gram language ID: ≥95% holdout accuracy on three
separable synthetic 'languages' (distinct character inventories —
latin words, accented vocabulary, CJK-range glyphs), string labels
round-tripping through the pipeline, confident posteriors, row-wise
scoring plan (no shuffle, no Python), and model persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.langid import (
    predict_lang,
    train_langid,
)

_WORDS = {
    "en": ["the", "query", "table", "fast", "window", "filter", "batch"],
    "fr": ["déjà", "être", "où", "français", "années", "hôtel", "çà"],
    "zh": ["数据", "查询", "表格", "快速", "窗口", "过滤", "批次"],
}


def _corpus(spark, n_per_lang=60, seed=0):
    rows = []
    did = seed * 10_000
    for lang, words in _WORDS.items():
        for i in range(n_per_lang):
            text = " ".join(
                words[(i + j + seed) % len(words)] for j in range(12)
            )
            rows.append((did, text, lang))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_accuracy_labels_and_plan(spark, tmp_path):
    train = _corpus(spark, seed=0)
    test = _corpus(spark, n_per_lang=25, seed=7)
    model = train_langid(train, n=2, n_features=1 << 12, max_iter=30)

    pred = predict_lang(model, test, n=2)
    rows = pred.join(
        test.select("doc_id", "lang"), "doc_id"
    ).collect()
    acc = sum(r["lang_pred"] == r["lang"] for r in rows) / len(rows)
    assert acc >= 0.95, acc
    assert {r["lang_pred"] for r in rows} <= set(_WORDS)  # strings back
    assert all(0.0 <= r["lang_prob"] <= 1.0 for r in rows)
    # confident on clean separable text
    assert sum(r["lang_prob"] > 0.8 for r in rows) / len(rows) > 0.9

    # scoring is a row-wise transform: no Exchange, no Python stage
    plan = (
        predict_lang(model, test, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan

    # standard ml artifact round-trip
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "langid_model")
    model.write().overwrite().save(path)
    again = PipelineModel.load(path)
    re_rows = {
        r["doc_id"]: r["lang_pred"]
        for r in predict_lang(again, test, n=2).collect()
    }
    assert re_rows == {r["doc_id"]: r["lang_pred"] for r in rows}
