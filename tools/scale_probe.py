"""Scale probe for BOTH banded-LSH families (embedding hyperplane bits
and text MinHash salts).

Synthesizes deterministic corpora at growing sizes and measures the
banded candidate-pair count and wall time, so the quadratic tail a fixed
geometry would develop is visible *before* a 100× scale-up. With
geometry fixed, in-bucket occupancy grows with N and candidate pairs go
quadratic; the scaling dial is ROWS PER BAND, grown logarithmically with
N by the helpers in ``functions/lsh_tuning.py`` (hyperplane: one bit per
corpus doubling for O(1) bucket occupancy; MinHash: salts per band so a
background-similarity pair's band-collision probability stays ~1/N).
Band count only multiplies candidates (it is the recall knob). The probe
prints the fixed and the log-scaled geometry side by side for each
family.

Usage: python tools/scale_probe.py [sizes...]   (default 2000 8000 32000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.functions.lsh_tuning import (
    hyperplane_rows_per_band,
    minhash_rows_per_band,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.dedup import (
    minhash_lsh_candidates,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
    lsh_banded_neardup_pairs,
)
from data_pipeline_project_using_telegram_and_aws_spark.session import get_spark


def synth_embeddings(spark, n: int, dims: int = 64):
    """Deterministic pseudo-random unit-cube vectors, fully engine-side
    (no driver loop): element d of vector i derives from xxhash64(i, d)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), d -> "
            f"cast(pmod(xxhash64(id * {dims} + d), 2000) / 1000.0 - 1.0 "
            f"as float))"
        ).alias("embedding"),
    )


def synth_documents(
    spark, n: int, n_tokens: int = 24, templates: int = 64, noise_pct: int = 25
):
    """Deterministic boilerplate corpus, engine-side: doc d instantiates
    template ``d % templates`` and rewrites ~noise_pct% of positions with
    a doc-unique token. Same-template pairs share most 3-gram shingles
    (background Jaccard ~0.1-0.2 — the boilerplate regime that melts a
    frozen MinHash band geometry: within-template candidate pairs grow
    ~N²/templates), cross-template pairs share none."""
    tok = (
        f"transform(sequence(0, {n_tokens - 1}), i -> "
        f"CASE WHEN pmod(xxhash64(id * {n_tokens} + i, 7), 100) < {noise_pct} "
        f"THEN concat('u', id, '_', i) "
        f"ELSE concat('t', pmod(id, {templates}), '_', i) END)"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join({tok}, ' ')").alias("text"),
    )


def probe(spark, n: int, n_planes: int, rows_per_band: int = 8) -> dict:
    emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
    t0 = time.time()
    pairs = lsh_banded_neardup_pairs(
        emb, n_planes=n_planes, rows_per_band=rows_per_band, top=None
    ).count()
    return {
        "n": n,
        "n_planes": n_planes,
        "bands": n_planes // rows_per_band,
        "candidate_pairs": pairs,
        "sec": round(time.time() - t0, 2),
    }


def probe_minhash(spark, n: int, rows_per_band: int, n_salts: int = 16) -> dict:
    docs = synth_documents(spark, n).localCheckpoint(eager=True)
    t0 = time.time()
    pairs = minhash_lsh_candidates(
        docs, n=3, n_salts=n_salts, rows_per_band=rows_per_band
    ).count()
    return {
        "n": n,
        "rows_per_band": rows_per_band,
        "bands": n_salts // rows_per_band,
        "candidate_pairs": pairs,
        "sec": round(time.time() - t0, 2),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        fixed = probe(spark, n, n_planes=16)            # frozen bench geometry
        rpb = hyperplane_rows_per_band(n)
        grown = probe(spark, n, n_planes=2 * rpb, rows_per_band=rpb)
        print(json.dumps({"family": "hyperplane",
                          "fixed_16_planes": fixed, "log2_scaled": grown}))
    for n in sizes:
        fixed = probe_minhash(spark, n, rows_per_band=2)  # frozen dd4 geometry
        grown = probe_minhash(spark, n, rows_per_band=minhash_rows_per_band(n))
        print(json.dumps({"family": "minhash",
                          "fixed_2_salts": fixed, "log_scaled": grown}))


if __name__ == "__main__":
    main()
