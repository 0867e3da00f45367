"""Sequence packing: determinism, no-split invariant, budget accounting,
and the strict mode. Python reference recomputation on a small corpus."""

from __future__ import annotations

import hashlib

from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)

BUDGET = 50


def _docs(spark, n=200):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range((i * 7) % 30 + 1)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_packing_matches_python_reference(spark):
    """Shard → md5 order → cumsum chunking, recomputed independently."""
    df = _docs(spark, 60)
    packed = pack_sequences(df, BUDGET, n_shards=4).collect()
    got = {r.doc_id: (r.shard, r.seq_id, r.seq_offset) for r in packed}
    toks = {r.doc_id: len(r.text.split()) for r in df.collect()}

    shards = {r.doc_id: r.shard for r in packed}  # trust xxhash64 from Spark
    by_shard: dict[int, list[int]] = {}
    for d, s in shards.items():
        by_shard.setdefault(s, []).append(d)
    want = {}
    for s, ids in by_shard.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        cum = 0
        for i in ids:
            want[i] = (s, cum // BUDGET, cum % BUDGET)
            cum += toks[i]
    assert got == want


def test_packing_invariants_and_stats(spark):
    df = _docs(spark, 200)
    packed = pack_sequences(df, BUDGET, n_shards=8)
    rows = packed.collect()
    assert len(rows) == 200                      # no doc lost or split
    assert len({r.doc_id for r in rows}) == 200
    max_doc = max(r.n_tokens for r in rows)

    stats = packing_stats(packed, BUDGET).collect()
    # every sequence's tokens fit in budget + one straddling doc
    assert all(s.seq_tokens <= BUDGET + max_doc for s in stats)
    # offsets stay inside the sequence
    assert all(0 <= r.seq_offset < BUDGET for r in rows)
    # deterministic across invocations
    again = {r.doc_id: (r.shard, r.seq_id, r.seq_offset)
             for r in pack_sequences(df, BUDGET, n_shards=8).collect()}
    assert again == {r.doc_id: (r.shard, r.seq_id, r.seq_offset) for r in rows}


def test_packing_strict_drops_oversized(spark):
    rows = [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 99))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(df, 50, n_shards=2, strict=True)
    assert [r.doc_id for r in packed.collect()] == [1]
    loose = pack_sequences(df, 50, n_shards=2, strict=False)
    st = packing_stats(loose, 50)
    assert any(s.overflows for s in st.collect())


def test_md5_shard_matches_python_reference(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        md5_shard,
    )

    docs = _docs(spark, n=50)
    got = {
        r["doc_id"]: r["shard"]
        for r in docs.select(
            "doc_id", md5_shard("doc_id", 8).alias("shard")
        ).collect()
    }
    for doc_id, shard in got.items():
        hex6 = hashlib.md5(str(doc_id).encode()).hexdigest()[:6]
        assert shard == int(hex6, 16) % 8


def test_materialize_sequences_orders_members_by_offset(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        materialize_sequences,
        pack_sequences,
    )

    docs = _docs(spark, n=60)
    packed = pack_sequences(docs, budget=40, n_shards=2)
    seqs = materialize_sequences(packed).collect()
    by_slot = {}
    for r in packed.collect():
        by_slot.setdefault((r["shard"], r["seq_id"]), []).append(
            (r["seq_offset"], r["text"], r["n_tokens"])
        )
    assert len(seqs) == len(by_slot)
    for s in seqs:
        members = sorted(by_slot[(s["shard"], s["seq_id"])])
        assert s["seq_text"] == " ".join(t for _, t, _ in members)
        assert s["n_docs"] == len(members)
        assert s["seq_tokens"] == sum(n for _, _, n in members)
        # joined text re-tokenizes to exactly seq_tokens whitespace tokens
        assert len(s["seq_text"].split()) == s["seq_tokens"]


def test_packing_layout_properties(spark):
    """Property suite over randomized corpora: the packed layout is a
    contiguous, non-overlapping tiling — for every shard, walking rows
    in (seq_id, seq_offset) order gives absolute token positions
    (seq_id·budget + seq_offset) that advance by exactly the previous
    document's tokens with no gaps or overlaps, every input document is
    placed exactly once, and strict mode drops exactly the docs longer
    than the budget. Independent of the md5 ordering itself, so it pins
    the algebra, not a mirror implementation."""
    from hypothesis import given, settings, strategies as st

    budget = 16
    corpora = st.lists(
        st.integers(min_value=0, max_value=24),  # includes 0 and > budget
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=15, deadline=None)
    @given(corpora)
    def run(token_counts):
        rows = [(i, int(n)) for i, n in enumerate(token_counts)]
        docs = spark.createDataFrame(rows, ["doc_id", "nt"])
        packed = pack_sequences(
            docs, budget=budget, n_shards=3, n_tokens_col="nt"
        ).collect()
        assert sorted(r.doc_id for r in packed) == [r[0] for r in rows]
        by_shard = {}
        for r in packed:
            by_shard.setdefault(r.shard, []).append(r)
        for members in by_shard.values():
            members.sort(key=lambda r: (r.seq_id, r.seq_offset))
            pos = 0
            for r in members:
                assert r.seq_id * budget + r.seq_offset == pos
                assert r.seq_id == pos // budget  # starts where cum floors
                pos += r.n_tokens

        strict = pack_sequences(
            docs, budget=budget, n_shards=3, n_tokens_col="nt", strict=True
        ).collect()
        assert sorted(r.doc_id for r in strict) == sorted(
            i for i, n in rows if n <= budget
        )

    run()


def test_default_shard_count_is_fixed_64(spark):
    """The default-arg layout is a persisted-artifact contract: it must
    equal an explicit n_shards=64 call and never drift with corpus size
    (derivation is the opt-in n_shards='auto' path — round-5 ADVICE)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, "a b c d") for i in range(200)], ["doc_id", "text"]
    )
    default = {
        r.doc_id: (r.shard, r.seq_id, r.seq_offset)
        for r in pack_sequences(df, BUDGET).collect()
    }
    explicit = {
        r.doc_id: (r.shard, r.seq_id, r.seq_offset)
        for r in pack_sequences(df, BUDGET, n_shards=64).collect()
    }
    assert default == explicit and len(default) == 200
    with _pytest.raises(ValueError, match="auto"):
        pack_sequences(df, BUDGET, n_shards="bogus")


def test_export_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        export_training_shards,
        materialize_sequences,
        md5_shard,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    packed = pack_sequences(
        docs, budget=512, n_shards=4, shard=md5_shard("doc_id", 4)
    )
    seqs = materialize_sequences(packed)
    out = str(tmp_path / "shards")
    manifest = {r.shard: r for r in export_training_shards(seqs, out).collect()}

    # one partition dir per shard, readable back in seq order
    back = spark.read.parquet(out)
    assert sorted(
        (r.shard, r.seq_id) for r in back.select("shard", "seq_id").collect()
    ) == sorted((r.shard, r.seq_id) for r in seqs.select("shard", "seq_id").collect())

    # manifest totals agree with the data
    want_seqs = seqs.count()
    want_tokens = sum(r.seq_tokens for r in seqs.select("seq_tokens").collect())
    assert manifest[-1].n_sequences == want_seqs
    assert manifest[-1].n_tokens == want_tokens
    assert sum(m.n_sequences for s, m in manifest.items() if s >= 0) == want_seqs
    # manifest is also persisted next to the data
    mback = spark.read.json(f"{out}/_manifest")
    assert mback.count() == len(manifest)


def test_shuffle_epoch_order_is_a_permutation(spark):
    """Every (shard, seq_id) appears exactly once with a dense
    epoch_pos per epoch_shard — a permutation, nothing lost or doubled."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        materialize_sequences,
        shuffle_epoch_order,
    )

    seqs = materialize_sequences(pack_sequences(_docs(spark), BUDGET, n_shards=4))
    ep = shuffle_epoch_order(seqs, seed=7).collect()
    assert sorted((r.shard, r.seq_id) for r in ep) == sorted(
        (r.shard, r.seq_id)
        for r in seqs.select("shard", "seq_id").collect()
    )
    by_es: dict[int, list[int]] = {}
    for r in ep:
        by_es.setdefault(r.epoch_shard, []).append(r.epoch_pos)
    assert set(by_es) <= set(range(4))
    for positions in by_es.values():
        assert sorted(positions) == list(range(len(positions)))


def test_shuffle_epoch_order_deterministic_and_layout_invariant(spark):
    """Same seed → identical assignment, regardless of the input's
    partition layout; different seed → a different order (the whole
    point of an epoch)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        materialize_sequences,
        shuffle_epoch_order,
    )

    seqs = materialize_sequences(pack_sequences(_docs(spark), BUDGET, n_shards=4))

    def key(df):
        return sorted(
            (r.shard, r.seq_id, r.epoch_shard, r.epoch_pos)
            for r in df.select(
                "shard", "seq_id", "epoch_shard", "epoch_pos"
            ).collect()
        )

    a = key(shuffle_epoch_order(seqs, seed=3))
    b = key(shuffle_epoch_order(seqs.repartition(13), seed=3))
    assert a == b
    other = key(shuffle_epoch_order(seqs, seed=4))
    assert a != other
    # and the epoch order differs from the packing order itself
    packing_order = sorted(
        (r.shard, r.seq_id, r.shard, r.seq_id)
        for r in seqs.select("shard", "seq_id").collect()
    )
    assert a != packing_order


def test_shuffle_epoch_order_exports_through_training_shards(spark, tmp_path):
    """The epoch layout round-trips through export_training_shards:
    one directory per epoch_shard, rows readable back in epoch_pos
    order, manifest totals unchanged from the packing export."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        export_training_shards,
        materialize_sequences,
        shuffle_epoch_order,
    )

    seqs = materialize_sequences(pack_sequences(_docs(spark), BUDGET, n_shards=4))
    ep = shuffle_epoch_order(seqs, seed=11, n_shards=3)
    out = str(tmp_path / "epoch0")
    manifest = {
        r.shard: r
        for r in export_training_shards(
            ep, out, shard_col="epoch_shard", order_col="epoch_pos"
        ).collect()
    }
    back = spark.read.parquet(out)
    assert back.count() == seqs.count()
    assert manifest[-1].n_sequences == seqs.count()
    assert manifest[-1].n_tokens == sum(
        r.seq_tokens for r in seqs.select("seq_tokens").collect()
    )
    assert set(back.select("epoch_shard").distinct().toPandas()["epoch_shard"]) <= {
        0,
        1,
        2,
    }


def test_packing_in_tokenizer_units(spark):
    """The n_tokens_col hook end-to-end: encode with BPE, pack by PIECE
    counts — sequences respect the budget in tokenizer units, not
    whitespace words (the unit a dataloader actually bills in)."""
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.bpe import (
        bpe_encode,
        train_bpe,
    )

    docs = _docs(spark, 80)
    merges = train_bpe(docs.limit(30), n_merges=10, min_pair_freq=1)
    encoded = bpe_encode(docs, merges)
    packed = pack_sequences(
        docs.join(encoded.select("doc_id", "n_pieces"), "doc_id"),
        budget=120,
        n_shards=4,
        n_tokens_col="n_pieces",
    )
    # n_tokens now carries piece counts
    joined = packed.join(
        encoded.select("doc_id", F.col("n_pieces").alias("np")), "doc_id"
    )
    assert joined.filter("n_tokens != np").count() == 0
    # every document STARTS inside its budget window, in piece units
    assert packed.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 120)
    ).count() == 0
    # conservation
    assert packed.count() == 80


def test_manifest_content_hash_verifies_and_catches_corruption(
    spark, tmp_path
):
    """The exported manifest's content hash round-trips through
    verify_training_shards (clean export → no mismatches); clobbering
    one shard's data is caught with the shard and field named."""
    import glob
    import os

    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        export_training_shards,
        materialize_sequences,
        verify_training_shards,
    )

    seqs = materialize_sequences(pack_sequences(_docs(spark), BUDGET, n_shards=4))
    out = str(tmp_path / "shards")
    manifest = export_training_shards(seqs, out)
    assert "content_hash" in manifest.columns
    assert verify_training_shards(spark, out) == []

    # corrupt one shard: drop one of its files
    victims = sorted(glob.glob(f"{out}/shard=*/part-*"))
    victim = victims[0]
    shard = int(victim.split("shard=")[1].split("/")[0])
    os.remove(victim)
    bad = verify_training_shards(spark, out)
    assert bad
    assert all(m["shard"] == shard for m in bad)
    assert {m["field"] for m in bad} >= {"content_hash"}
