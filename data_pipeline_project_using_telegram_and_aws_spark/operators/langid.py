"""Trained character-n-gram language identification — the model-based
rung above `plans/text_queries.py`'s stopword-marker heuristic (tx3),
built from the same no-vocabulary-pass pieces as
`operators/quality_classifier.py`: hashed character n-grams →
multinomial logistic regression (pyspark.ml), so training needs one
fitting pass and scoring is a row-wise JVM transform with no Python
and no shuffle.

Design choices, stated:

- **character n-grams, not words** (the fastText/CLD recipe): script
  and orthography live at the character level, word features break on
  unsegmented scripts, and the hashing trick keeps the feature space
  fixed regardless of how many languages or alphabets appear;
- **first ``max_chars`` characters only**: language is decidable from
  a prefix; capping bounds the row-local n-gram array on pathological
  documents (the block-cap stance);
- **labels round-trip as strings**: StringIndexer at fit time,
  IndexToString at predict time — callers never see label indices;
- the n-gram array is built by a plain Catalyst expression
  (``transform(sequence(...)) → substring``) BEFORE the ml pipeline,
  and :func:`predict_lang` applies the same expression — the model
  artifact stays a standard persistable ``PipelineModel``.

Honest caveat: the bundled testdata's ``lang`` labels decorate
near-identical synthetic token soup, so no classifier can beat
majority class THERE; the machinery is pinned on a separable fixture
in tests, and real corpora are the intended target.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IndexToString, StringIndexer
from pyspark.sql import DataFrame, functions as F

NGRAM_COL = "__char_ngrams"


def _ngram_expr(text_col: str, n: int, max_chars: int):
    t = F.lower(F.substring(F.col(text_col), 1, max_chars))
    count = F.greatest(F.length(t) - n + 1, F.lit(0))
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_langid(
    labeled_docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    max_chars: int = 512,
    n_features: int = 1 << 15,
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> PipelineModel:
    """Fit hashed char-n-gram multinomial LR on (text, lang) rows.
    Returns a persistable PipelineModel whose label metadata carries
    the language strings."""
    prepared = labeled_docs.withColumn(
        NGRAM_COL, _ngram_expr(text_col, n, max_chars)
    )
    indexer = StringIndexer(
        inputCol=lang_col, outputCol="__label", handleInvalid="error"
    )
    tf = HashingTF(
        inputCol=NGRAM_COL, outputCol="__features", numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        regParam=reg_param,
        maxIter=max_iter,
        family="multinomial",
    )
    idx_model = indexer.fit(prepared)
    back = IndexToString(
        inputCol="prediction",
        outputCol="lang_pred",
        labels=idx_model.labels,
    )
    return Pipeline(stages=[idx_model, tf, lr, back]).fit(prepared)


def predict_lang(
    model: PipelineModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_chars: int = 512,
) -> DataFrame:
    """(id, lang_pred, lang_prob): predicted language + its posterior.
    Row-wise transform — the corpus never shuffles. ``n``/``max_chars``
    must match training (they parameterize the pre-model expression,
    not the persisted pipeline — pass them together)."""
    from pyspark.ml.functions import vector_to_array

    prepared = docs.select(F.col(id_col), F.col(text_col)).withColumn(
        NGRAM_COL, _ngram_expr(text_col, n, max_chars)
    )
    # the StringIndexer stage expects the training lang column; feed a
    # dummy so transform resolves (its output is unused at predict)
    lang_col = model.stages[0].getInputCol()
    prepared = prepared.withColumn(
        lang_col, F.lit(model.stages[0].labels[0])
    )
    out = model.transform(prepared)
    prob = F.round(
        F.array_max(vector_to_array(F.col("probability"))), 6
    )
    return out.select(
        F.col(id_col), "lang_pred", prob.alias("lang_prob")
    )
