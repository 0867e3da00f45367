"""Scale probe for the banded-LSH near-dup path (VERDICT r1 item 9).

Synthesizes deterministic embedding corpora at growing sizes and measures
the banded candidate-pair count and wall time, so the quadratic tail a
fixed bucket count would develop is visible *before* a 100× scale-up.
With geometry fixed, in-bucket occupancy grows linearly with N and
candidate pairs grow ~bands·N²/2^rows_per_band. The scaling dial is
ROWS PER BAND (buckets per band = 2^rpb): growing rpb with log2(N) keeps
expected bucket occupancy O(1) and pair growth ~linear, while band count
controls recall. (Adding bands of unchanged width — the tempting "more
planes" knob — only multiplies candidates.) The probe prints the fixed
and the log2-scaled geometry side by side.

Usage: python tools/scale_probe.py [sizes...]   (default 2000 8000 32000)
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

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


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        fixed = probe(spark, n, n_planes=16)            # fixed geometry
        rpb = max(8, round(math.log2(n)) - 3)           # 2^rpb ≈ N/8 buckets
        grown = probe(spark, n, n_planes=2 * rpb, rows_per_band=rpb)
        print(json.dumps({"fixed_16_planes": fixed, "log2_scaled": grown}))


if __name__ == "__main__":
    main()
