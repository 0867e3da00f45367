"""Model-based document quality filtering — the *trained* stage of the
quality ladder, complementing the corpus-statistic scorers:

    heuristics (text_queries quality panel)
      → self-perplexity (lm_score unigram/bigram)
        → trained classifier (this module)

The public recipe (GPT-3's CommonCrawl filter, CCNet's fastText stage):
fit a linear classifier that separates a known-good reference corpus
from the raw pool, keep documents the model scores as reference-like.
This is the fastText stand-in built from what Spark ships: hashed
bag-of-words features into logistic regression, all pyspark.ml.

Scale shape:
- features: ``HashingTF`` over whitespace tokens — the hashing trick
  means NO vocabulary pass and no vocab broadcast at all; feature
  extraction is row-local and the dimensionality is a fixed
  ``n_features`` regardless of corpus size;
- training: ``LogisticRegression`` (L-BFGS) over the labeled frame —
  training sets for quality filters are curated samples (10⁴-10⁶ docs),
  not the 100 TB pool; the pool is only ever *scored*;
- scoring: ``PipelineModel.transform`` — JVM-side expression over the
  hashed features (the model's coefficient vector rides the closure,
  megabytes at 2¹⁸ features), one narrow pass over the corpus, no
  shuffle, no Python workers.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import DataFrame, functions as F


def train_quality_classifier(
    labeled_docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> PipelineModel:
    """Fit tokenizer → hashed-BoW → logistic regression on a labeled
    frame (``label_col``: 1.0 = reference-quality, 0.0 = raw pool).
    Returns the fitted ``PipelineModel``; persist it with
    ``model.write().save(path)`` like any pyspark.ml artifact."""
    tokenizer = RegexTokenizer(
        inputCol=text_col,
        outputCol="__words",
        pattern=" ",
        gaps=True,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol="__words", outputCol="__features", numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[tokenizer, tf, lr]).fit(labeled_docs)


def score_documents(
    model: PipelineModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, quality_prob) — P(reference-quality) per document,
    rounded to 6 dp. One row per input document (transform is row-wise;
    nothing drops)."""
    scored = model.transform(docs.select(id_col, text_col))
    # probability is a Vector([p0, p1]); element 1 is the positive class
    prob = F.round(vector_element(F.col("probability"), 1), 6)
    return scored.select(F.col(id_col), prob.alias("quality_prob"))


def vector_element(vec_col, index: int):
    """ml.linalg.Vector element as a double column (JVM-side: pyspark
    exposes this as ``functions.vector_to_array`` backed by a Scala
    expression, not a Python UDF)."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(vec_col)[index]


def quality_filter(
    model: PipelineModel,
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents whose classifier score clears ``threshold`` — the
    keep-side of the trained filter, with the score attached for
    downstream mixing/audit (pair with ``curation.py``'s drop-ledger
    pattern when provenance is required)."""
    scores = score_documents(model, docs, id_col, text_col)
    return (
        docs.join(scores, id_col)
        .filter(F.col("quality_prob") >= threshold)
    )
