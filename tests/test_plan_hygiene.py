"""Physical-plan hygiene pins (SURVEY §4): predicate pushdown, column
pruning, and broadcast joins must actually appear in the executed plan —
a regression here is invisible to result-correctness tests but fatal at
100 TB.
"""

from __future__ import annotations

import re

from data_pipeline_project_using_telegram_and_aws_spark.plans import starschema_queries as sq

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    # default maxMetadataStringLength=100 truncates the PushedFilters list
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_filters_push_to_parquet_scan(spark):
    plan = _plan(sq.q5_tpch_q6_forecast_revenue(spark, SF_DIR))
    pushed = plan[plan.find("PushedFilters") :]
    # the range predicate reaches the parquet reader, not a post-scan filter
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "IsNotNull(l_discount)" in pushed


def test_q5_scan_prunes_columns(spark):
    plan = _plan(sq.q5_tpch_q6_forecast_revenue(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 4 needed columns only — a 16-column read for a 4-column query is the
    # classic pruning regression
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q8_dim_chain_broadcasts(spark):
    plan = _plan(sq.q8_join_multiway_revenue_by_nation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the fact table must never be on a shuffled sort-merge path here
    assert "SortMergeJoin" not in plan


def test_pk1_packing_scan_prunes_to_id_and_text(spark):
    """Packing derives everything from (doc_id, text): reading lang/
    source/n_chars for the stats output would be the pruning
    regression."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.pipeline_queries import (
        pk1_sequence_packing,
    )

    plan = _plan(pk1_sequence_packing(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}


def test_dc1_eval_side_broadcasts(spark):
    """Decontamination must broadcast the (small) eval gram table — the
    train corpus never shuffles by gram."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.pipeline_queries import (
        dc1_decontamination,
    )

    plan = _plan(dc1_decontamination(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_vc1_encode_join_broadcasts_vocab(spark):
    """The vocab→token-id mapping must reach the corpus as a broadcast
    (vocabularies are megabytes); a shuffled join keyed by token would
    reshuffle the whole exploded corpus at 100 TB."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.pipeline_queries import (
        vc1_vocab_encode,
    )

    plan = _plan(vc1_vocab_encode(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_sp1_mixture_and_split_are_projection_only(spark):
    """Mixture sampling + split assignment are pure projections (hash
    dice, explode, CASE): the only Exchange allowed in the plan is the
    final presentation orderBy's range partitioning — any hash Exchange
    means a shuffle crept into the recipe path."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.pipeline_queries import (
        sp1_split_mixture,
    )

    plan = _plan(sp1_split_mixture(spark, SF_DIR))
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    ]
    assert len(exchanges) == 1 and "rangepartitioning" in exchanges[0]


def test_pk2_materialize_reuses_shard_partitioning(spark):
    """Materialization groups by (shard, seq_id); the plan may shuffle on
    the shard hash and range-sort for presentation, but the documents
    table itself must still be read with only (doc_id, text)."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.pipeline_queries import (
        pk2_materialized_sequences,
    )

    plan = _plan(pk2_materialized_sequences(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}


def test_q21_topk_is_take_ordered_not_global_sort(spark):
    """q21 left the driver registry in round 5 (slot funds cc1), but its
    physical claim — ORDER BY ... LIMIT compiles to TakeOrderedAndProject,
    never a full global sort — stays pinned here."""
    plan = _plan(sq.q21_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    # no range-partitioned global sort for a top-k
    assert "rangepartitioning" not in plan.lower().replace(" ", "")
