"""Order-independent, engine-exact SUM/AVG over double columns.

Double summation is order-dependent and Spark's partial-agg combine order
is not stable run-to-run, so a rounded double sum can flip its last
displayed digit between engines or runs (the round-1 q35 red row). Two
exact alternatives were measured on the TPC-H Q1 shape at sf0.1:

- ``DECIMAL(18,6)`` accumulation: exact, but sum precision exceeds 18 and
  leaves Spark's long-backed fast path → 4.8 s (vs 0.7 s raw double).
- **scaled-long accumulation** (this module): round(v·10⁶) as BIGINT,
  exact integer sum inside whole-stage codegen, divide once at the end →
  1.4 s. The per-value rounding is identical on both engines (ties away
  from zero; an exact tie requires a dyadic ×10⁶ value, impossible for
  binary doubles), and equal integer sums convert to equal doubles even
  past 2^53 (both engines take nearest-double of the same integer).

Capacity: Σ|v|·10⁶ must stay below 2^63 ≈ 9.2e18 — 6 fractional digits
leaves 12 integer digits of headroom per group, plenty for the graded
scales. At 100 TB group sums approaching 1e12 would need the scale
dropped (e.g. 10⁴) or the DECIMAL path — a documented dial, not a
silent wrap.

Definition caveat: a checked aggregate is the sum of PER-ROW
round(v·10⁶) values, not the rounded true sum — each row contributes up
to 5e-7 absolute error, so with n rows the fixed-point result can drift
up to n·5e-7 from the plain double/DECIMAL sum and, at large n, flip
the last displayed digit vs a canonical (e.g. TPC-H-published) answer.
That is the accepted trade: both engines compute the identical
fixed-point definition, which is what makes the comparison
deterministic; raise SCALE where value magnitudes leave headroom if
closer agreement with the true sum is ever needed.

Every helper here has a textual twin for the DuckDB oracle so both sides
compute literally the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 1_000_000  # 6 fractional digits preserved exactly


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scaled(col: Column | str) -> Column:
    """round(v·SCALE) as long — the exact-summable fixed-point value."""
    return F.round(_c(col) * float(SCALE)).cast("long")


def exact_sum(col: Column | str, dp: int = 2) -> Column:
    """Order-exact SUM of a double expression, rounded to ``dp``."""
    return F.round(F.sum(scaled(col)) / float(SCALE), dp)


def exact_avg(col: Column | str, dp: int = 2) -> Column:
    """Order-exact mean: exact fixed-point sum, two deterministic double
    divisions (÷SCALE then ÷count), rounded to ``dp``."""
    c = _c(col)
    return F.round(F.sum(scaled(c)) / float(SCALE) / F.count(c), dp)


def exact_window_sum(col: Column | str, window, dp: int = 2) -> Column:
    """Order-exact windowed running SUM (e.g. cumulative frames)."""
    return F.round(F.sum(scaled(col)).over(window) / float(SCALE), dp)


def sql_sum(expr: str, dp: int = 2) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return (
        f"ROUND(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT))"
        f" / {SCALE}.0, {dp})"
    )


def sql_avg(expr: str, dp: int = 2) -> str:
    """DuckDB twin of :func:`exact_avg`."""
    return (
        f"ROUND(SUM(CAST(round(({expr}) * {SCALE}) AS BIGINT))"
        f" / {SCALE}.0 / COUNT({expr}), {dp})"
    )
