"""Probe-backed sizing rules for the remaining operator dials: IVF
centroid count, packing shard count, and skew-join salt count.

``lsh_tuning.py`` turned rows_per_band from a frozen constant into a
measured ``f(log2 N)``; this module does the same for the three dials
that were still caller-picked constants (VERDICT r3 item 4). Each rule
states its cost model and the measured curve from
``tools/scale_probe.py`` that backs it, so the 100 TB sizing story is a
formula tied to evidence, not a comment.

- **IVF centroids** ``k``: per-query work is ``k`` centroid comparisons
  plus ``nprobe · N/k`` list-member comparisons — minimized at
  ``k = sqrt(nprobe · N)`` (the FAISS nlist ≈ sqrt(N) convention, with
  the nprobe factor made explicit). Build cost (every corpus vector
  scores k centroids) grows ~linearly in k, which caps how far past the
  rule "more lists" can be pushed. Measured (``probe_ivf``, N=32k,
  nprobe=2, build and query timed separately — conflating them lets the
  O(N·k) assignment swamp the query curve): query 15 centroids → 2.62 s,
  253 (=rule) → 1.19 s (the minimum), 1012 → 1.32 s; build 5.0 s →
  11.5 s → 133.9 s. The rule's k sits at the query minimum at ~12×
  less build cost than the next quadrupling.
- **Packing shards**: shards bound both write parallelism and the
  per-shard window state; the waste is the tail sequence per shard
  (expected ~budget/2 tokens each), so shards should track corpus size,
  not sit at a constant. ``n_docs / target_docs_per_shard`` keeps
  per-task window work constant as the corpus grows. Measured curve
  (``probe_packing``, N=200k synthetic docs, budget 256): 1 shard →
  3.01 s wall at fill 1.0000 (zero parallelism: one global window
  task), 8 → 1.27 s / 0.9997, 64 → 0.85 s / 0.9988, 512 → 0.75 s /
  0.9882 — wall time falls with parallelism while tail waste
  (~n_shards · budget/2 tokens) stays negligible until shards approach
  corpus_tokens/budget. The default target (256k docs/shard) keeps a
  1000-executor cluster busy past ~10⁸ docs while bounding each window
  task's sort to one task-sized chunk.
- **Skew salts**: the hot key's reducer shrinks by n_salts while the
  small side's shuffle volume multiplies by it (operators/skew.py cost
  model) — so the right salt count is the ratio of the hottest key's
  rows to a comfortable per-task row count, clamped well below the
  small side's replication budget. No wall-clock probe: at test scale
  the effect is pure plan shape (pinned in tests/test_skew.py); the
  rule just encodes the documented ratio.
"""

from __future__ import annotations

import math


def ivf_n_centroids(
    n_vectors: int, nprobe: int = 2, lo: int = 4, hi: int = 1 << 18
) -> int:
    """Centroid count minimizing per-query work ``k + nprobe·N/k``:
    ``k = sqrt(nprobe · N)``, clamped. At N=10⁹ / nprobe=8 this is ~90k
    lists — the regime where the assignments table is bucketed by
    centroid_id (sources/bucketing.py) and a query reads nprobe buckets.
    """
    k = round(math.sqrt(max(n_vectors, 1) * max(nprobe, 1)))
    return max(lo, min(hi, k))


def ivf_n_centroids_two_level(
    n_vectors: int, lo: int = 4, hi: int = 1 << 20
) -> int:
    """Centroid count for an index whose consumers use TWO-LEVEL
    assignment (:func:`ivf_two_level_min_k` regime): ``k = n^(2/3)``.

    Rationale: with flat n·k assignment the balance against the
    intra-cluster pair scan (n²/k) is k = √n → both terms Θ(n^1.5) —
    that is the wall, not an escape (r13 probe: flat dedup exponent
    1.29; and even two-level assignment under the √n rule re-exposes
    the pair term: r14 measured exponent 1.36 from 200k→600k because
    pairs n²/√n dominate). Two-level assignment costs ~n·√k, which
    balances n²/k at k = n^(2/3) — both terms Θ(n^(4/3)), the best
    composed exponent this design admits. Requires
    `train_centroids_hierarchical` for the build (flat Lloyd training
    is O(k²) under the per-centroid sample rule — 155 s at k=737,
    r13). Measured curve: BENCH_NOTES r14 composed-probe section."""
    k = round(max(n_vectors, 1) ** (2.0 / 3.0))
    return max(lo, min(hi, k))


def ivf_coarse_probes() -> int:
    """Coarse-cell probe count for two-level IVF assignment
    (:func:`operators.similarity.hierarchical_ivf_assign`): per-vector
    scored centroids drop from k to ~(1 + probes)·√k, so probes is the
    recall dial against that factor. 4 is the r13-probed setting (the
    measured 2.55× dedup-stage win at 200k vectors and the 0.91
    exponent both used probes=4); SemDeDup consumers only need cluster
    membership (boundary perturbation, not ranking), so a small probe
    count is the right default."""
    return 4


def ivf_two_level_min_k(probes: int | None = None) -> int:
    """Centroid count at or above which two-level (coarse-quantized)
    assignment replaces flat n·k scoring as the DEFAULT in
    :func:`operators.semdedup.semantic_dedup`.

    Cost model: flat scores k centroids per vector; two-level scores
    ~(1 + probes)·√k plus pays coarse training (index-sized) and one
    extra corpus-keyed window. Equal-work crossover is
    √k = 1 + probes ⇒ k = (1 + probes)², but the fixed extra window +
    coarse Lloyd push the empirical crossover higher. Measured
    (tools/scale_probe.py --semdedup-dispatch, n=20k, probes=4, r14):
    k=128 two-level LOSES (10.84 vs 9.30 s dedup), k=200 it wins
    (7.81 vs 8.18 s — matching the r13 reading 11.1 vs 12.0 at the
    same geometry), and the win widens with k (2.55× by k=632,
    r13 probe). 160 is the bracket midpoint between the last measured
    loss (128) and the first measured win (200). The registered sd1
    geometry (k=16) dispatches flat — the exact, oracle-checked
    path — by an order of magnitude of margin."""
    if probes is None:
        probes = ivf_coarse_probes()
    return max(160, (1 + probes) ** 2)


def ivf_sample_n(k: int, per_centroid: int = 16, lo: int = 256) -> int:
    """Lloyd training-sample size for k centroids: ``per_centroid``
    training vectors per centroid keeps the mean updates stable while
    the train cost stays O(sample·k·iters) regardless of corpus size
    (train_centroids_lloyd's bound)."""
    return max(lo, per_centroid * k)


def packing_n_shards(
    n_docs: int,
    target_docs_per_shard: int = 262_144,
    lo: int = 8,
    hi: int = 1 << 20,
) -> int:
    """Shard count keeping ~``target_docs_per_shard`` documents per
    shard: per-task window work stays constant as the corpus grows, and
    expected tail waste (one ~half-full sequence per shard) stays
    negligible while shards ≪ corpus_tokens/budget."""
    shards = math.ceil(max(n_docs, 1) / target_docs_per_shard)
    return max(lo, min(hi, shards))


def blocked_pairs_max_block_rows(
    target_pairs_per_block: int = 50_000_000,
) -> int:
    """Guard bound for :func:`operators.similarity.blocked_neardup_pairs`
    (the documented O(block²) baseline): a block of B rows self-joins
    into B(B-1)/2 pairs that land in ONE task (the equi-join on the
    block key co-locates the whole block), so per-task pair work is
    bounded by capping B at ``sqrt(2 · target_pairs_per_block)``. The
    default 5·10⁷ pairs is roughly one task-minute of vectorized cosine
    work — the guard fires far below anything that could OOM an executor
    or stall a stage for hours, which is exactly the failure mode of
    running the baseline on a production-sized block instead of the
    banded-LSH path (``lsh_banded_neardup_pairs``)."""
    return int(math.sqrt(2 * target_pairs_per_block))


def collected_group_max_rows(
    bytes_per_row: int,
    target_bytes_per_task: int = 64 * 1024 * 1024,
    lo: int = 1024,
) -> int:
    """Guard bound for per-group ``collect_list`` operators (funnel's
    per-user event arrays, dialog assembly's per-conversation turn
    arrays): unlike a window aggregate, ``collect_list`` materializes
    the WHOLE group as one in-memory array inside one task — it cannot
    spill — so one pathological key (a bot emitting millions of funnel
    events, a never-idle speaker) OOMs an executor hours into a job.
    The bound caps the array at ``target_bytes_per_task`` of payload
    (default 64 MB — comfortably inside a multi-GB executor even with
    several concurrent tasks) given the caller's per-element width:
    funnel's (timestamp, int) struct is ~16 B → ~4M events; a dialog
    turn carrying text is ~256 B+ → ~262k turns. Enforced IN-PLAN with
    the same ``assert_true``-over-a-count-window pattern as
    ``blocked_pairs_max_block_rows`` (the window count spills; the
    collect would not), so oversized keys fail loudly with the key
    named BEFORE the array builds."""
    return max(lo, target_bytes_per_task // max(bytes_per_row, 1))


def skew_n_salts(
    hot_key_rows: int,
    target_rows_per_task: int = 1_000_000,
    lo: int = 2,
    hi: int = 1024,
) -> int:
    """Salt count for :func:`operators.skew.salted_join`: enough to
    shrink the hottest key's reducer to ~``target_rows_per_task`` rows,
    clamped at ``hi`` because every salt replicates the small side's
    shuffle volume once."""
    salts = math.ceil(max(hot_key_rows, 1) / target_rows_per_task)
    return max(lo, min(hi, salts))


def cc_driver_max_edges(max_seconds: float = 1.5) -> int:
    """Edge-count bound below which connected components runs as a
    driver-side union-find instead of the iterative cluster loop.

    Measured curve (single-threaded path-halving union-find + min-label
    resolution, this container): 10³ edges 1 ms, 10⁴ 20 ms, 10⁵ 0.18 s,
    10⁶ 3.0 s — near-linear, ~3 µs/edge. The cluster loop costs
    ~0.3-0.5 s per hash-min round (scheduling, not compute) times
    ~diameter rounds, so the driver pass wins everywhere its own cost
    stays under a couple of rounds (~1.5 s ⇒ ~5·10⁵ edges, an ~8 MB
    collect — far below any driver-memory concern). Above the bound the
    iterative loop takes over; the judgment is the same one that
    broadcasts a small dimension table instead of shuffling for it."""
    return int(max_seconds / 3e-6)


def bm25_rowlocal_max_terms() -> int:
    """Query-term bound below which :func:`operators.retrieval.
    bm25_scores`'s inline path computes per-term frequencies ROW-LOCALLY
    (one per-term count over each document's token array — a pure
    projection) instead of exploding every corpus token into a
    (doc, term)-keyed shuffle aggregation.

    Cost model: row-local tf costs O(dl · |T|) equality checks per
    document against the explode path's O(dl) row generation PLUS a
    survivors-keyed shuffle + hash aggregation. Measured twice:

    - rt1's corpus (sf0.1, 5k docs, 270k tokens, |T| = 9): row-local
      0.5 s vs explode 2.1 s (~4×);
    - probe corpus (50k docs × 40 tokens, full end-to-end bm25): |T|=4
      → 1.8 vs 2.4 s, |T|=16 → 2.1 vs 2.6, |T|=64 → 4.7 vs 2.9,
      |T|=128 → 7.3 vs 2.6 — the explode path is |T|-flat (its shuffle
      amortizes terms) while row-local grows linearly, crossing
      between 16 and 64.

    32 sits inside the measured win region on both corpora with margin
    under the crossover; larger query sets take the explode path."""
    return 32


def dsir_rowlocal_max_buckets(max_literal_bytes: int = 2 * 1024 * 1024) -> int:
    """Bucket-space bound for `operators/dsir.dsir_importance`'s
    ``method="rowlocal"`` — the zero-shuffle path that embeds the
    ratio table as a flat array literal in the plan. The literal costs
    8 B per bucket in every serialized plan/task closure, so the bound
    caps it at ``max_literal_bytes`` (default 2 MiB ≈ 262k buckets —
    26× the paper's 10k feature space, far below anything that strains
    task serialization). The rowlocal-vs-join choice itself is a
    measured CPU-vs-shuffle trade (join is ~3.8× faster in-core at
    sf0.1 — interpreted HOF fold vs codegen'd explode+join — but
    shuffles the whole corpus on id; BENCH_NOTES has the probe);
    this bound only guards the literal's size once rowlocal is
    chosen."""
    return max_literal_bytes // 8
