"""Round-4 registry consolidation pins.

The driver verifies exactly the first 50 registered queries, so funding
driver rows for vc1/pk2/sp1 required retiring three rows whose checks
are strictly subsumed elsewhere (the same documented move as r3's
dd3/ss4/tx5 merges). These tests keep the retired rows' machinery
covered and pin the subsumption itself:

- tx4_fingerprints -> its fingerprint/shard_key columns are now part of
  dd5's hash-checked output; parity asserted here.
- q12_distinct_and_counts -> its DISTINCT projection + countDistinct +
  broadcast-scalar cross join now ride inside q13; q12 itself is checked
  against directly computed distinct counts.
- mm1_binary_metadata -> its JVM metadata surface is mm2's media_type +
  cross-path agreement booleans; parity asserted here.
"""

from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.plans.dedup_queries import (
    dd5_simhash_fingerprints,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans.multimodal_queries import (
    mm1_binary_metadata,
    mm2_decode_features,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans.starschema_queries import (
    q12_distinct_and_counts,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans.text_queries import (
    tx4_fingerprints,
)


def test_tx4_fingerprints_subsumed_by_dd5(spark, sf_dir):
    tx4 = {
        r.doc_id: (r.fingerprint, r.shard_key)
        for r in tx4_fingerprints(spark, sf_dir).collect()
    }
    dd5 = {
        r.doc_id: (r.fingerprint, r.shard_key)
        for r in dd5_simhash_fingerprints(spark, sf_dir).collect()
    }
    assert tx4 == dd5 and len(tx4) > 0


def test_q12_distinct_counts_still_correct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = q12_distinct_and_counts(spark, sf_dir).collect()
    want_supp = li.select("l_suppkey").distinct().count()
    want_part = li.select("l_partkey").distinct().count()
    want_pairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert len(rows) == want_pairs
    assert all(
        r.distinct_suppkeys == want_supp and r.distinct_partkeys == want_part
        for r in rows
    )


def test_mm1_metadata_subsumed_by_mm2(spark, sf_dir):
    mm1 = {
        r.media_id: (r.media_type, r.n_bytes, r.content_hash)
        for r in mm1_binary_metadata(spark, sf_dir).collect()
    }
    mm2 = {
        r.media_id: (r.media_type, r.n_bytes, r.content_hash)
        for r in mm2_decode_features(spark, sf_dir).collect()
    }
    assert mm1 == mm2 and len(mm1) > 0


def test_mm2_cross_path_booleans_are_true(spark, sf_dir):
    rows = mm2_decode_features(spark, sf_dir).collect()
    assert all(r.jvm_python_bytes_agree and r.jvm_python_hash_agree for r in rows)
