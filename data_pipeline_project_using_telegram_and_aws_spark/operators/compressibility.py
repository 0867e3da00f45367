"""Compressibility as a quality signal: per-document
``len(zlib(text)) / len(text)`` — the cheap, language-agnostic filter
feature the Gopher/FineWeb lineage uses alongside repetition scores.
Boilerplate/templated spam compresses extremely well (low ratio);
encrypted/binary junk barely compresses (ratio ≈ 1); natural prose
sits in a stable middle band. Both tails are drop candidates; the gate
takes the band.

Scale honesty: there is no JVM-side deflate expression in Spark SQL,
so this is a REAL Python path — an Arrow-batched Pandas UDF running
zlib (C speed, ~100 MB/s/core) over (id, text) only. That is the
correct shape for an unavoidable UDF: two columns enter Python, one
struct leaves, no shuffle anywhere, and the scan prunes to exactly the
columns used. Prefer `tx7`'s JVM-side repetition scores when only the
low tail matters; compressibility adds the high-entropy tail they
cannot see.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT = StructType(
    [
        StructField("n_bytes", LongType()),
        StructField("n_compressed", LongType()),
        StructField("compression_ratio", DoubleType()),
    ]
)


def _ratio_udf(level: int):
    @F.pandas_udf(_OUT)
    def ratios(texts: pd.Series) -> pd.DataFrame:
        n_bytes, n_comp, ratio = [], [], []
        for t in texts:
            raw = (t or "").encode("utf-8")
            n = len(raw)
            c = len(zlib.compress(raw, level)) if n else 0
            n_bytes.append(n)
            n_comp.append(c)
            # zlib's ~11-byte header dominates tiny docs; report NULL
            # below 64 bytes rather than a misleading >1 ratio.
            ratio.append(round(c / n, 6) if n >= 64 else None)
        return pd.DataFrame(
            {
                "n_bytes": n_bytes,
                "n_compressed": n_comp,
                "compression_ratio": ratio,
            }
        )

    return ratios


def compression_ratios(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, compression_ratio) per document;
    ratio is NULL for docs under 64 bytes (header noise dominates)."""
    r = _ratio_udf(level)(F.col(text_col)).alias("r")
    return docs.select(F.col(id_col), r).select(
        id_col, "r.n_bytes", "r.n_compressed", "r.compression_ratio"
    )


def compressibility_gate(
    docs: DataFrame,
    lo: float = 0.20,
    hi: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Keep documents whose ratio lies in [lo, hi] — dropping the
    too-compressible (templated/repeated) low tail and the
    incompressible (non-text) high tail. Docs with NULL ratio (under
    64 bytes) pass: too short to judge by entropy, length gates exist
    for them. Returns the input columns unchanged."""
    scored = compression_ratios(docs, id_col, text_col, level)
    keep = scored.filter(
        F.col("compression_ratio").isNull()
        | F.col("compression_ratio").between(lo, hi)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
