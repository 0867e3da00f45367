"""Corpus text normalization: the canonical-form pass that runs before
dedup and tokenization so that byte-different renderings of the same
text (stray control characters, zero-width marks, exotic whitespace,
decomposed accents) stop defeating exact hashes and inflating
vocabularies.

Two tiers, split by where they can run:

- :func:`normalize_text` — the JVM tier: everything expressible as
  regexp/translate stays in whole-stage codegen. Strips C0/C1 control
  characters (keeping \\n and \\t), zero-width and BOM code points,
  canonicalizes all Unicode whitespace to plain space, collapses runs,
  trims, and optionally lowercases. This is the hot-path default.
- :func:`normalize_unicode` — the honest-Python tier:
  ``unicodedata.normalize`` (NFC/NFKC) has no Spark expression, so
  composition/compatibility folding runs as an Arrow-batched Pandas
  UDF over (id, text) only — the `compressibility.py` stance: when
  Python is unavoidable, it sees exactly two columns and no shuffle.
  NFKC additionally folds width/compatibility forms (ﬁ → fi, ２ → 2),
  which changes bytes MEANINGFULLY — choose per corpus policy.

Order matters and is documented: unicode-normalize first (it can
produce combining sequences the JVM tier then leaves alone), JVM tier
second. ``normalize_corpus`` composes them in that order.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

# C0 controls (minus \t \n), DEL + C1, zero-width joiners/space,
# word-joiner, BOM -- written as escapes so no invisible character
# hides in this source file
_CONTROL = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f"
    "\u200b-\u200d\u2060\ufeff]"
)
# Unicode whitespace variants -> plain space: NBSP, ogham, U+2000-200A,
# line/para separators, narrow NBSP, math space, ideographic space,
# plus \r (CRLF -> plain space then collapsed)
_UNISPACE = (
    "[\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000\r]"
)


def normalize_text(
    col: Column | str,
    lowercase: bool = False,
) -> Column:
    """JVM-tier normalization expression (usable in any select)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _CONTROL, "")
    c = F.regexp_replace(c, _UNISPACE, " ")
    c = F.regexp_replace(c, r" {2,}", " ")
    # spaces hugging a newline are rendering noise, not content
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"^[\t ]+|[\t ]+$", "")
    if lowercase:
        c = F.lower(c)
    return c


def normalize_unicode(
    docs: DataFrame,
    form: str = "NFC",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) with ``unicodedata.normalize(form, ...)`` applied —
    the Python tier, Arrow-batched, two columns in, nothing else
    touches the interpreter. NULL stays NULL."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize_unicode: unknown form {form!r}")

    @F.pandas_udf(StringType())
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: unicodedata.normalize(form, t)
            if t is not None
            else None
        )

    return docs.select(F.col(id_col), norm(F.col(text_col)).alias(text_col))


def normalize_corpus(
    docs: DataFrame,
    unicode_form: str | None = "NFC",
    lowercase: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The composed pass in the correct order (unicode fold → JVM
    cleanup), preserving the input's other columns. ``unicode_form=
    None`` skips the Python tier entirely — the all-JVM fast path for
    corpora already known to be composed."""
    out = docs
    if unicode_form is not None:
        folded = normalize_unicode(docs, unicode_form, id_col, text_col)
        out = docs.drop(text_col).join(folded, id_col)
    return out.withColumn(
        text_col, normalize_text(F.col(text_col), lowercase)
    )
