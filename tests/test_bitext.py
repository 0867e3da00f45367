"""Margin-based bitext mining + semantic decontamination
(`operators/bitext.py`) — pinned against an INDEPENDENT scalar NumPy
oracle that recomputes cosines, both directions' top-k neighborhood
means, margins, best-per-endpoint selection, and the mutual filter
from scratch; plus planted-structure cases (true translation pairs
must surface, a hub vector must not) and exact-vs-blocked path
equality."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.bitext import (
    decontaminate_semantic,
    mine_bitext,
    score_pairs,
)


def _embed_rows(mat, prefix=""):
    return [
        (f"{prefix}{i}", [float(x) for x in row])
        for i, row in enumerate(mat)
    ]


def _round4(x: float) -> float:
    # Spark F.round is HALF_UP; numpy/python round are half-even.
    # Inputs here are rng floats, never at a .00005 boundary, so
    # plain round matches (asserted by the equality checks passing).
    return float(round(x, 4))


def _oracle_mine(src, tgt, k, method, mutual, threshold):
    """Scalar re-implementation of the whole margin pipeline."""
    cos = {}
    for sid, sv in src:
        a = np.array(sv)
        for tid, tv in tgt:
            b = np.array(tv)
            cos[(sid, tid)] = _round4(
                float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            )
    src_ids = [s for s, _ in src]
    tgt_ids = [t for t, _ in tgt]

    def fwd_rank(sid):
        return sorted(tgt_ids, key=lambda t: (-cos[(sid, t)], t))

    def bwd_rank(tid):
        return sorted(src_ids, key=lambda s: (-cos[(s, tid)], s))

    fa = {
        s: np.mean([cos[(s, t)] for t in fwd_rank(s)[:k]])
        for s in src_ids
    }
    ba = {
        t: np.mean([cos[(s, t)] for s in bwd_rank(t)[:k]])
        for t in tgt_ids
    }

    def margin(s, t):
        avg = (fa[s] + ba[t]) / 2.0
        c = cos[(s, t)]
        if method == "ratio":
            return _round4(c / avg)
        if method == "distance":
            return _round4(c - avg)
        return c

    cand = {
        (s, t)
        for s in src_ids
        for t in fwd_rank(s)[:k]
    } | {
        (s, t)
        for t in tgt_ids
        for s in bwd_rank(t)[:k]
    }
    best_f = {}
    for s in src_ids:
        opts = [(t, margin(s, t)) for (s2, t) in cand if s2 == s]
        t, m = min(opts, key=lambda x: (-x[1], x[0]))
        best_f[s] = (t, m)
    out = {}
    for s, (t, m) in best_f.items():
        if mutual:
            opts = [
                (s2, margin(s2, t)) for (s2, t2) in cand if t2 == t
            ]
            s_best, _ = min(opts, key=lambda x: (-x[1], x[0]))
            if s_best != s:
                continue
        if threshold is not None and m < threshold:
            continue
        out[(s, t)] = (cos[(s, t)], m)
    return out


@pytest.mark.parametrize("method,threshold", [
    ("ratio", None), ("ratio", 1.02), ("distance", 0.0),
    ("absolute", None),
])
@pytest.mark.parametrize("mutual", [True, False])
def test_mine_matches_scalar_oracle(spark, method, threshold, mutual):
    rng = np.random.default_rng(11)
    src_m = rng.normal(size=(12, 8))
    tgt_m = rng.normal(size=(15, 8))
    src, tgt = _embed_rows(src_m, "s"), _embed_rows(tgt_m, "t")
    sdf = spark.createDataFrame(src, "src_id string, embedding array<double>")
    tdf = spark.createDataFrame(tgt, "tgt_id string, embedding array<double>")
    got = {
        (r.src_id, r.tgt_id): (r.cos_sim, r.margin)
        for r in mine_bitext(
            sdf, tdf, k=3, method=method, threshold=threshold,
            mutual=mutual,
        ).collect()
    }
    want = _oracle_mine(src, tgt, 3, method, mutual, threshold)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == pytest.approx(want[key][0], abs=2e-4)
        assert got[key][1] == pytest.approx(want[key][1], abs=2e-4)


def test_planted_translations_surface_and_hub_does_not(spark):
    """Structure case: 6 src rows each have a noisy copy in tgt
    (the 'translations'); tgt also carries a HUB (near the global
    mean, high cosine to everything) and distractors. Margin mining
    must pair each src with its planted twin and never with the hub
    — the exact failure raw-cosine thresholding has."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(6, 16)) * 0.07
    twins = base + noise
    hub = base.mean(axis=0) * 1.2  # cosine-close to every src row
    distract = rng.normal(size=(4, 16))
    tgt_m = np.vstack([twins, hub[None, :], distract])
    sdf = spark.createDataFrame(
        _embed_rows(base, "s"), "src_id string, embedding array<double>"
    )
    tdf = spark.createDataFrame(
        _embed_rows(tgt_m, "t"), "tgt_id string, embedding array<double>"
    )
    mined = {
        r.src_id: r.tgt_id
        for r in mine_bitext(
            sdf, tdf, k=3, method="ratio", threshold=1.0
        ).collect()
    }
    assert mined == {f"s{i}": f"t{i}" for i in range(6)}
    # the hub is every row's high-cosine neighbor, yet mined never
    assert "t6" not in mined.values()
    # sanity that the trap is real: the hub IS inside raw-cosine
    # top-3 neighborhoods (so only the margin kept it out of pairs)
    rows = score_pairs(sdf, tdf).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src_id, []).append((r.cos_sim, r.tgt_id))
    top3 = {
        s: {t for _, t in sorted(v, reverse=True)[:3]}
        for s, v in by_src.items()
    }
    assert any("t6" in v for v in top3.values())


def test_blocked_pairs_path_equals_exact_when_candidates_cover(spark):
    """pairs=-injection (the ANN scale path) returns the same mined
    set when the candidate generator covers the top-k neighborhoods
    — here proven with the exact pair set itself passed as the
    'blocked' input."""
    rng = np.random.default_rng(23)
    sdf = spark.createDataFrame(
        _embed_rows(rng.normal(size=(10, 8)), "s"),
        "src_id string, embedding array<double>",
    )
    tdf = spark.createDataFrame(
        _embed_rows(rng.normal(size=(10, 8)), "t"),
        "tgt_id string, embedding array<double>",
    )
    exact = mine_bitext(sdf, tdf, k=3).collect()
    injected = mine_bitext(
        k=3, pairs=score_pairs(sdf, tdf)
    ).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, injected))


def test_id_collision_between_corpora_is_harmless(spark):
    """Both corpora using the same id values (0..n) must not drop
    the diagonal pairs — the subtlety the one-pair-set design exists
    for (a two-kNN composition with a self-id filter loses them)."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 8))
    sdf = spark.createDataFrame(
        [(str(i), [float(x) for x in row]) for i, row in enumerate(base)],
        "src_id string, embedding array<double>",
    )
    # tgt = same ids, same vectors: best pair for i is tgt i itself
    tdf = spark.createDataFrame(
        [(str(i), [float(x) for x in row]) for i, row in enumerate(base)],
        "tgt_id string, embedding array<double>",
    )
    mined = {
        r.src_id: (r.tgt_id, r.cos_sim)
        for r in mine_bitext(sdf, tdf, k=2).collect()
    }
    assert {s: t for s, (t, _) in mined.items()} == {
        str(i): str(i) for i in range(5)
    }
    assert all(c == pytest.approx(1.0) for _, c in mined.values())


def test_mine_bitext_failures_are_loud(spark):
    sdf = spark.createDataFrame(
        [("a", [1.0, 0.0])], "src_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="method"):
        mine_bitext(sdf, sdf, method="cosine")
    with pytest.raises(ValueError, match="k=0"):
        mine_bitext(sdf, sdf, k=0)
    with pytest.raises(ValueError, match="pairs="):
        mine_bitext(k=2)


def test_decontaminate_semantic_drops_paraphrase_leaks(spark):
    """Corpus rows at high cosine to ANY eval row leave; the rest
    stay with all their columns; n-gram-invisible leakage (same
    embedding, different surface text) is exactly what goes."""
    rng = np.random.default_rng(9)
    ev = rng.normal(size=(3, 8))
    ev /= np.linalg.norm(ev, axis=1, keepdims=True)
    clean = rng.normal(size=(4, 8))
    leak0 = ev[0] + rng.normal(size=8) * 0.01   # paraphrase of eval 0
    leak2 = ev[2] * 3.0                          # scaled copy of eval 2
    corpus_rows = [
        ("doc_leak0", "totally different words", [float(x) for x in leak0]),
        ("doc_leak2", "also unrelated surface", [float(x) for x in leak2]),
    ] + [
        (f"doc_{i}", f"text {i}", [float(x) for x in row])
        for i, row in enumerate(clean)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "doc_id string, text string, embedding array<double>"
    )
    eval_df = spark.createDataFrame(
        _embed_rows(ev, "e"), "eval_id string, embedding array<double>"
    )
    kept = decontaminate_semantic(corpus, eval_df, threshold=0.9)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {f"doc_{i}" for i in range(4)}
    # survivors keep every column
    assert set(kept.columns) == {"doc_id", "text", "embedding"}
