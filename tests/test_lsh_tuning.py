"""The rows_per_band scale rule (functions/lsh_tuning.py): pinned curve
values, divisor snapping, and agreement with the geometries the
oracle-checked queries pin at their bench corpus sizes."""

from __future__ import annotations

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.functions.lsh_tuning import (
    hyperplane_rows_per_band,
    minhash_rows_per_band,
)


def test_hyperplane_curve_grows_one_bit_per_doubling():
    assert hyperplane_rows_per_band(2_000) == 8
    assert hyperplane_rows_per_band(4_000) == 9
    assert hyperplane_rows_per_band(8_000) == 10
    assert hyperplane_rows_per_band(1_000_000) == 17
    assert hyperplane_rows_per_band(10) == 4          # lo clamp
    assert hyperplane_rows_per_band(10**12) == 32      # hi clamp


def test_minhash_curve_snaps_to_signature_divisors():
    # ln(N)/ln(1/0.1): 500 -> 2.7 -> snap down to divisor 2 of 16
    assert minhash_rows_per_band(500) == 2
    assert minhash_rows_per_band(100_000) == 4         # raw 5.0
    assert minhash_rows_per_band(10**8) == 8           # raw 8.0
    assert minhash_rows_per_band(10**13) == 8          # raw 13 -> divisor 8
    assert minhash_rows_per_band(10**16, n_salts=32) == 16  # raw 16.0
    with pytest.raises(ValueError):
        minhash_rows_per_band(500, background_jaccard=1.5)


def test_pinned_query_geometries_derive_from_the_rule():
    """The bench-pinned constants are the helper evaluated at the sf0.1
    corpus sizes — the scale rule and the oracle constants are one code
    path, not parallel magic numbers."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.dedup_queries import (
        DD4_ROWS_PER_BAND,
        DD6_ROWS_PER_BAND,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.plans.similarity_queries import (
        SS3_PLANES,
        SS3_ROWS_PER_BAND,
    )

    assert SS3_ROWS_PER_BAND == hyperplane_rows_per_band(2000) == 8
    assert SS3_PLANES == 2 * SS3_ROWS_PER_BAND
    assert DD6_ROWS_PER_BAND == hyperplane_rows_per_band(2000) == 8
    assert DD4_ROWS_PER_BAND == minhash_rows_per_band(500) == 2
