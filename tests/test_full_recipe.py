"""End-to-end batch recipe: the whole training-data preparation chain
run as one composition, the way a user of this engine would —

    raw docs
      → curate_corpus (quality gates + LM gate + near-dup closure,
        auditable drop ledger)
      → decontaminate against an eval suite (n-gram collisions)
      → trained quality-classifier filter
      → deterministic splits
      → BPE train + encode
      → pack_sequences + materialize_sequences

Each stage is oracle- or reference-pinned on its own elsewhere; this
test pins the CONTRACTS BETWEEN them: document conservation (every
input row lands in exactly one of kept/ledger; every surviving doc is
packed exactly once), leak-freedom (no contaminated doc reaches a
sequence), and determinism (the whole chain reruns bit-identically).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.bpe import (
    bpe_encode,
    train_bpe,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
    curate_corpus,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
    contamination_report,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
    materialize_sequences,
    pack_sequences,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
    score_documents,
    train_quality_classifier,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
    assign_split,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import (
    load_table,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    # plant a verbatim eval leak and an exact duplicate so the decon and
    # dedup stages demonstrably fire
    base = docs.filter(F.col("doc_id") == 7).first()
    extra = docs.sparkSession.createDataFrame(
        [
            (90001, base.text, base.lang),          # exact dup of doc 7
            (90002, "leak " + base.text, base.lang),
        ],
        ["doc_id", "text", "lang"],
    )
    return docs.unionByName(extra)


@pytest.fixture(scope="module")
def eval_suite(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id").isin(7, 11)).select(
        F.col("doc_id").alias("eval_id"), "text"
    ).withColumnRenamed("eval_id", "doc_id")


def _run_chain(corpus, eval_suite):
    kept, ledger = curate_corpus(corpus, near_dup_closure="components")
    contaminated = (
        contamination_report(kept, eval_suite, n=8)
        .filter(F.col("contamination") >= 0.8)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    clean = kept.join(contaminated, "doc_id", "left_anti")
    labeled = clean.withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    model = train_quality_classifier(labeled, n_features=1 << 12)
    scored = clean.join(score_documents(model, clean), "doc_id")
    train = assign_split(
        scored, {"train": 0.9, "holdout": 0.1}, salt="recipe"
    ).filter(F.col("split") == "train")
    merges = train_bpe(train.limit(50), n_merges=8)
    encoded = bpe_encode(train, merges)
    packed = pack_sequences(
        train.select("doc_id", "text"), budget=512, n_shards=8
    )
    sequences = materialize_sequences(packed, text_col="text")
    return kept, ledger, clean, train, encoded, packed, sequences


def test_full_chain_contracts(corpus, eval_suite):
    kept, ledger, clean, train, encoded, packed, sequences = _run_chain(
        corpus, eval_suite
    )
    n_in = corpus.count()
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    ledger_ids = {r.doc_id for r in ledger.select("doc_id").collect()}
    # conservation: every input doc in exactly one of kept/ledger
    assert len(kept_ids) + len(ledger_ids) == n_in
    assert not (kept_ids & ledger_ids)
    # the planted exact duplicate was dropped, its original kept
    assert 90001 in ledger_ids and 7 in kept_ids

    # decontamination: the planted verbatim leak is gone from clean
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 90002 not in clean_ids
    # eval docs themselves (in-corpus twins) are also flagged
    assert 7 not in clean_ids

    # every train doc encoded exactly once and packed exactly once
    train_ids = [r.doc_id for r in train.select("doc_id").collect()]
    enc_ids = [r.doc_id for r in encoded.select("doc_id").collect()]
    packed_ids = [r.doc_id for r in packed.select("doc_id").collect()]
    assert sorted(enc_ids) == sorted(train_ids) == sorted(packed_ids)

    # budget contract (contiguous tiling): every document STARTS inside
    # its sequence's budget window — docs may straddle the boundary (the
    # dataloader chops), but an offset at/past the budget would mean a
    # gap or a misplaced slot
    bad_offsets = packed.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 512)
    ).count()
    assert bad_offsets == 0
    assert sequences.count() > 0


def test_full_chain_is_deterministic(corpus, eval_suite):
    _, _, _, train_a, _, packed_a, _ = _run_chain(corpus, eval_suite)
    _, _, _, train_b, _, packed_b, _ = _run_chain(corpus, eval_suite)
    a = sorted(r.doc_id for r in train_a.select("doc_id").collect())
    b = sorted(r.doc_id for r in train_b.select("doc_id").collect())
    assert a == b
    pa = sorted(
        (r.doc_id, r.shard, r.seq_id, r.seq_offset)
        for r in packed_a.collect()
    )
    pb = sorted(
        (r.doc_id, r.shard, r.seq_id, r.seq_offset)
        for r in packed_b.collect()
    )
    assert pa == pb


def test_round5_ops_compose(corpus):
    """The round-5 additions run as one chain downstream of curation:
    quality-temperature sampling → per-lang token budgets → unigram
    encode → pack → epoch shuffle, with an HLL ledger audit at the end.
    Pins the contracts BETWEEN them: survivor subsets, per-group budget
    holds, every budgeted doc encoded exactly once, the epoch shuffle
    is a permutation of the packed sequences, and the sketch audit
    agrees with the exact count."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        shuffle_epoch_order,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.sketches import (
        hll_ledger,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        take_tokens_per_group,
        temperature_sample,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.unigram_tokenizer import (
        train_unigram,
        unigram_encode,
    )

    scored = corpus.withColumn(
        "score", F.when(F.col("lang") == "en", 1.0).otherwise(0.5)
    )
    sampled = temperature_sample(scored, "score", tau=1.0, max_score=1.0)
    # p=1 rows all survive; the sampled set is a subset of the input
    assert sampled.filter("lang = 'en'").count() == scored.filter(
        "lang = 'en'"
    ).count()
    assert sampled.count() < scored.count()

    budgeted = take_tokens_per_group(sampled, "lang", 4000).cache()
    per_lang = (
        budgeted.withColumn("nt", F.size(F.split("text", " ")))
        .groupBy("lang")
        .agg(F.sum("nt").alias("t"))
        .collect()
    )
    assert all(r["t"] <= 4000 for r in per_lang)

    pieces = train_unigram(
        budgeted.limit(30), vocab_size=120, max_piece_len=4
    )
    encoded = unigram_encode(budgeted, pieces, max_piece_len=4)
    b_ids = sorted(r.doc_id for r in budgeted.select("doc_id").collect())
    e_ids = sorted(r.doc_id for r in encoded.select("doc_id").collect())
    assert b_ids == e_ids  # exactly once, none lost

    packed = pack_sequences(
        budgeted.select("doc_id", "text"), budget=256, n_shards=4
    )
    seqs = materialize_sequences(packed, text_col="text")
    ep = shuffle_epoch_order(seqs, seed=5)
    assert sorted(
        (r.shard, r.seq_id) for r in ep.select("shard", "seq_id").collect()
    ) == sorted(
        (r.shard, r.seq_id) for r in seqs.select("shard", "seq_id").collect()
    )

    audit = hll_ledger(budgeted, "doc_id", by=["lang"]).collect()
    exact = {
        r["lang"]: r["n"]
        for r in budgeted.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    for r in audit:
        assert abs(r["distinct_est"] - exact[r["lang"]]) <= max(
            3, 0.05 * exact[r["lang"]]
        )
    budgeted.unpersist()
