"""Erasure blast-radius + selective shard re-export: affected_shards
names exactly the erased docs' shards, reexport_shards rewrites only
those partitions (dropping ones that emptied), the patched manifest
carries unaffected rows verbatim, and verify_training_shards stays
green over the patched artifact."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
    affected_shards,
    export_training_shards,
    materialize_sequences,
    pack_sequences,
    reexport_shards,
    verify_training_shards,
)

N_SHARDS = 16
BUDGET = 12


def _docs(spark):
    rows = [(i, f"doc {i} " + "tok " * (i % 5 + 1)) for i in range(24)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _export(spark, path):
    docs = _docs(spark)
    packed = pack_sequences(docs, BUDGET, n_shards=N_SHARDS)
    seqs = materialize_sequences(packed)
    manifest = export_training_shards(seqs, str(path))
    return docs, packed, manifest


def _manifest_rows(path):
    rows = {}
    for f in Path(f"{path}/_manifest").glob("part-*"):
        for line in f.read_text().splitlines():
            row = json.loads(line)
            rows[int(row["shard"])] = row
    return rows


def _shard_census(packed):
    """doc_id -> shard, plus a shard with >=2 docs and a singleton
    shard (the fixture pins both cases exist)."""
    by_doc = {
        r["doc_id"]: r["shard"] for r in packed.select("doc_id", "shard").collect()
    }
    counts = {}
    for s in by_doc.values():
        counts[s] = counts.get(s, 0) + 1
    multi = [s for s, c in counts.items() if c >= 2]
    single = [s for s, c in counts.items() if c == 1]
    assert multi and single, f"fixture needs both shapes: {counts}"
    return by_doc, multi[0], single[0]


def test_affected_shards_is_the_blast_radius(spark, tmp_path):
    docs, packed, _ = _export(spark, tmp_path / "art")
    by_doc, multi, single = _shard_census(packed)
    victim = next(d for d, s in by_doc.items() if s == multi)
    got = [
        r["shard"]
        for r in affected_shards(
            packed, spark.createDataFrame([(victim,)], ["doc_id"])
        ).collect()
    ]
    assert got == [multi]


def test_reexport_rewrites_only_the_erased_docs_shard(spark, tmp_path):
    path = tmp_path / "art"
    docs, packed, _ = _export(spark, path)
    before = _manifest_rows(path)
    by_doc, multi, _ = _shard_census(packed)
    victim = next(d for d, s in by_doc.items() if s == multi)

    survivors = docs.filter(F.col("doc_id") != victim)
    repacked = pack_sequences(survivors, BUDGET, n_shards=N_SHARDS)
    seqs = materialize_sequences(repacked)
    blast = [
        r["shard"]
        for r in affected_shards(
            packed, spark.createDataFrame([(victim,)], ["doc_id"])
        ).collect()
    ]
    patched = reexport_shards(seqs, str(path), blast)
    after = _manifest_rows(path)

    # verify is green against the patched manifest
    assert verify_training_shards(spark, str(path)) == []
    # unaffected rows carried over verbatim, hash included
    for s, row in before.items():
        if s in (-1, multi):
            continue
        assert after[s] == row, s
    # the rewritten shard's hash moved (a doc left it)
    assert after[multi]["content_hash"] != before[multi]["content_hash"]
    # the erased text is gone from the data files
    data = spark.read.parquet(str(path))
    assert (
        data.filter(F.col("seq_text").contains(f"doc {victim} ")).count()
        == 0
    )
    # the returned manifest matches the persisted one
    ret = {int(r["shard"]): r for r in patched.collect()}
    assert set(ret) == set(after)


def test_emptied_shard_partition_and_manifest_row_are_dropped(
    spark, tmp_path
):
    path = tmp_path / "art"
    docs, packed, _ = _export(spark, path)
    by_doc, _, single = _shard_census(packed)
    victim = next(d for d, s in by_doc.items() if s == single)

    survivors = docs.filter(F.col("doc_id") != victim)
    repacked = pack_sequences(survivors, BUDGET, n_shards=N_SHARDS)
    seqs = materialize_sequences(repacked)
    reexport_shards(seqs, str(path), [single])

    assert not (Path(path) / f"shard={single}").exists()
    after = _manifest_rows(path)
    assert single not in after
    assert verify_training_shards(spark, str(path)) == []
    # totals re-add across the surviving rows
    total = after[-1]
    assert total["n_sequences"] == sum(
        r["n_sequences"] for s, r in after.items() if s != -1
    )


def test_reexport_guards(spark, tmp_path):
    path = tmp_path / "art"
    docs, packed, _ = _export(spark, path)
    seqs = materialize_sequences(packed)
    with pytest.raises(ValueError, match="empty shard list"):
        reexport_shards(seqs, str(path), [])
    with pytest.raises(ValueError, match="no manifest"):
        reexport_shards(seqs, str(tmp_path / "nowhere"), [0])


def test_patched_manifest_equals_from_scratch_export(spark, tmp_path):
    """The strongest oracle: after an erasure, the selectively patched
    artifact's manifest must equal, row for row, the manifest of a
    from-scratch full export of the survivor corpus (hash-stable
    layout makes the full export the exact twin)."""
    path = tmp_path / "art"
    docs, packed, _ = _export(spark, path)
    by_doc, multi, single = _shard_census(packed)
    victims = [
        next(d for d, s in by_doc.items() if s == multi),
        next(d for d, s in by_doc.items() if s == single),
    ]
    survivors = docs.filter(~F.col("doc_id").isin(victims))
    repacked = pack_sequences(survivors, BUDGET, n_shards=N_SHARDS)
    seqs = materialize_sequences(repacked)
    blast = sorted(
        r["shard"]
        for r in affected_shards(
            packed,
            spark.createDataFrame([(v,) for v in victims], ["doc_id"]),
        ).collect()
    )
    assert blast == sorted({multi, single})
    reexport_shards(seqs, str(path), blast)

    fresh_path = tmp_path / "fresh"
    export_training_shards(seqs, str(fresh_path))
    assert _manifest_rows(path) == _manifest_rows(fresh_path)
    assert verify_training_shards(spark, str(path)) == []


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(st.sets(st.integers(0, 23), min_size=1, max_size=6))
def test_random_erasure_sets_patch_to_the_from_scratch_twin(
    spark, tmp_path_factory, victims
):
    """Model check: for ANY erasure set, selective re-export of the
    blast radius equals a from-scratch export of the survivors."""
    path = tmp_path_factory.mktemp("re") / "art"
    docs, packed, _ = _export(spark, path)
    victims = sorted(victims)
    vdf = spark.createDataFrame([(v,) for v in victims], ["doc_id"])
    survivors = docs.join(vdf, "doc_id", "left_anti")
    repacked = pack_sequences(survivors, BUDGET, n_shards=N_SHARDS)
    seqs = materialize_sequences(repacked)
    blast = [
        r["shard"] for r in affected_shards(packed, vdf).collect()
    ]
    reexport_shards(seqs, str(path), blast)
    fresh = tmp_path_factory.mktemp("re") / "fresh"
    export_training_shards(seqs, str(fresh))
    assert _manifest_rows(path) == _manifest_rows(fresh)
    assert verify_training_shards(spark, str(path)) == []


def test_crash_between_rewrite_and_manifest_patch_is_loud_and_retryable(
    spark, tmp_path
):
    """The documented crash window: data partitions rewritten but the
    manifest patch not yet landed -> verify goes red on exactly the
    rewritten shard, and re-running reexport_shards converges."""
    path = tmp_path / "art"
    docs, packed, _ = _export(spark, path)
    before = _manifest_rows(path)
    by_doc, multi, _ = _shard_census(packed)
    victim = next(d for d, s in by_doc.items() if s == multi)
    survivors = docs.filter(F.col("doc_id") != victim)
    seqs = materialize_sequences(
        pack_sequences(survivors, BUDGET, n_shards=N_SHARDS)
    )
    reexport_shards(seqs, str(path), [multi])

    # simulate the crash: roll the manifest back to its pre-patch state
    mdir = Path(path) / "_manifest"
    for f in mdir.glob("part-*"):
        f.unlink()
    (mdir / "part-crash.json").write_text(
        "\n".join(
            json.dumps(row)
            for _, row in sorted(before.items())
        )
    )
    red = verify_training_shards(spark, str(path))
    assert red and {m["shard"] for m in red} == {multi}

    # the documented recovery: same call, same arguments
    reexport_shards(seqs, str(path), [multi])
    assert verify_training_shards(spark, str(path)) == []
