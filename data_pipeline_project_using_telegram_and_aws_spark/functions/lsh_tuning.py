"""Geometry tuning for the two banded-LSH families: rows_per_band as a
function of corpus size.

Both LSH paths (hyperplane bits over embeddings, MinHash salts over text
shingles) share the banded structure — a pair becomes a candidate iff it
collides on ALL rows of at least one band — and the same failure mode: a
geometry frozen at bench scale goes quadratic at corpus scale. The dial
is rows per band; bands only multiply candidates (recall knob). Measured
curves (``tools/scale_probe.py``, N=2k/8k/32k): fixed 16-plane embedding
geometry grows 18k→293k→4.7M candidate pairs (quadratic) vs
18k→83k→375k log2-scaled (~linear); fixed 2-salt MinHash bands on a
boilerplate corpus grow 3.3k→54k→864k (quadratic) while the helper's
4-salt bands at N=32k cut candidates 31× to 27.8k.

Why the two families scale differently:

- **Hyperplane bits**: a band of ``rpb`` bits has 2^rpb buckets and
  random vectors spread ~uniformly, so expected occupancy is N/2^rpb and
  in-band pair work is N²/2^rpb. Holding occupancy at a target ``t``
  gives ``rpb = log2(N/t)`` — rows_per_band grows one bit per corpus
  doubling.
- **MinHash salts**: buckets are md5 digests of the band's salt-mins, so
  the bucket space is effectively unbounded and collisions happen only
  when band signatures are EQUAL — probability j^rpb for a pair with
  Jaccard j. Expected false-candidate pairs ≈ bands · C(N,2) · E[j_bg^rpb]
  for the background similarity j_bg; keeping that ~linear in N needs
  ``j_bg^rpb ≈ 1/N``, i.e. ``rpb = ln(N)/ln(1/j_bg)`` — again
  logarithmic growth, with the background similarity setting the base.
  rpb is snapped DOWN to a divisor of n_salts (bands must tile the
  signature): the conservative direction — more candidates, full recall.

The pinned geometries of the oracle-checked queries are derived from
these helpers at their corpus sizes (ss3/dd6: 2000 embeddings → 8 bits;
dd4: 500 documents → 2 salts), so bench constants and the scale rule are
the same code path.
"""

from __future__ import annotations

import math


def hyperplane_rows_per_band(
    n: int, target_occupancy: int = 8, lo: int = 4, hi: int = 32
) -> int:
    """Bits per band so the 2^rpb buckets per band keep expected bucket
    occupancy ~``target_occupancy`` (in-band pair work O(N·t) instead of
    O(N²/2^rpb)). Grows one bit per corpus doubling."""
    rpb = round(math.log2(max(n, 2) / target_occupancy))
    return max(lo, min(hi, rpb))


def minhash_rows_per_band(
    n: int,
    n_salts: int = 16,
    background_jaccard: float = 0.1,
    lo: int = 2,
) -> int:
    """Salts per band so a background-similarity pair's per-band
    collision probability is ~1/N (false candidates ~linear in N),
    snapped down to a divisor of ``n_salts`` so bands tile the
    signature. Snapping down biases toward recall (more candidates)."""
    if not 0 < background_jaccard < 1:
        raise ValueError("background_jaccard must be in (0, 1)")
    raw = math.log(max(n, 2)) / math.log(1.0 / background_jaccard)
    best = lo
    for d in range(1, n_salts + 1):
        if n_salts % d == 0 and lo <= d <= max(raw, lo):
            best = max(best, d)
    return best
