"""Disclosure-risk export gates: rare-combination audit, k-anonymity
enforcement (drop and fail modes, NULL quasi values as one joinable
value, k-anonymity of the survivor frame verified by recount), and
minimum-cell-size suppression on aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.privacy import (
    enforce_k_anonymity,
    rare_combinations,
    suppress_small_groups,
)

ROWS = [
    # (zip, year, payload) — "10001"×1990 has 3 rows, "10002"×1991 has
    # 2, "10003"×1992 is a singleton, NULL×1990 has 2 (nulls group)
    ("10001", 1990, "a"),
    ("10001", 1990, "b"),
    ("10001", 1990, "c"),
    ("10002", 1991, "d"),
    ("10002", 1991, "e"),
    ("10003", 1992, "f"),
    (None, 1990, "g"),
    (None, 1990, "h"),
]
SCHEMA = "zip string, birth_year int, payload string"


def test_rare_combinations_audit(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rare = rare_combinations(df, ["zip", "birth_year"], k=3).collect()
    got = {(r["zip"], r["birth_year"]): r["n"] for r in rare}
    assert got == {
        ("10003", 1992): 1,
        ("10002", 1991): 2,
        (None, 1990): 2,
    }
    assert rare[0]["n"] == 1  # singletons lead
    with pytest.raises(ValueError, match="k must be >= 2"):
        rare_combinations(df, ["zip"], k=1)


def test_enforce_k_anonymity_drop_and_recount(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = enforce_k_anonymity(df, ["zip", "birth_year"], k=2)
    kept = {r["payload"] for r in out.collect()}
    assert kept == {"a", "b", "c", "d", "e", "g", "h"}  # singleton gone
    # the released frame is k-anonymous by recount: zero rare combos
    assert (
        rare_combinations(out, ["zip", "birth_year"], k=2).count() == 0
    )
    # k=4: only the size-3 group dies too
    out4 = enforce_k_anonymity(df, ["zip", "birth_year"], k=4)
    assert out4.count() == 0  # no combo reaches 4

    # NULL quasi values are one joinable value: the two NULL-zip rows
    # survive k=2 together
    assert {"g", "h"} <= kept


def test_enforce_k_anonymity_fail_mode_names_the_combo(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(Exception, match=r"10003,1992 appears 1 < k=2"):
        enforce_k_anonymity(
            df, ["zip", "birth_year"], k=2, on_violation="fail"
        ).collect()
    clean = spark.createDataFrame(
        [r for r in ROWS if r[2] != "f"], SCHEMA
    )
    assert (
        enforce_k_anonymity(
            clean, ["zip", "birth_year"], k=2, on_violation="fail"
        ).count()
        == 7
    )
    with pytest.raises(ValueError, match="drop | fail"):
        enforce_k_anonymity(df, ["zip"], k=2, on_violation="mask")


def test_suppress_small_groups_on_aggregates(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    agg = df.groupBy("zip").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("payload").alias("payloads"),
    )
    out = suppress_small_groups(agg, "n", k=2).collect()
    assert {r["zip"] for r in out} == {"10001", "10002", None}


def test_release_pipeline_composition(spark):
    """The release recipe end-to-end: PII-scrub the text, pseudonymize
    the join key, then k-anonymity-gate the quasi identifiers — the
    surviving frame has no raw id column, no under-k combination, and
    the pseudonymized key still joins back to other pseudonymized
    tables (referential integrity across the release)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.redaction import (
        pseudonymize,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "10001", 1990, "mail me at a@b.com"),
            (2, "10001", 1990, "hello"),
            (3, "10001", 1990, "world"),
            (4, "10009", 1999, "singleton combo with b@c.org"),
        ],
        "user_id long, zip string, birth_year int, text string",
    )
    released = enforce_k_anonymity(
        pseudonymize(
            # redact_pii APPENDS the scrubbed column; the release drops
            # the raw text explicitly — nothing raw leaves
            redact_pii(docs, text_col="text").drop("text"),
            ["user_id"],
            secret="s3",
        ),
        ["zip", "birth_year"],
        k=2,
    )
    rows = released.collect()
    assert "user_id" not in released.columns  # raw id left the dataset
    assert "text" not in released.columns  # raw text left the dataset
    assert {r["zip"] for r in rows} == {"10001"}  # singleton suppressed
    assert all("@" not in r["text_redacted"] for r in rows)  # scrubbed
    assert rare_combinations(released, ["zip", "birth_year"], 2).count() == 0

    # the keyed surrogate still joins across released tables
    other = pseudonymize(
        spark.createDataFrame([(1, "x")], "user_id long, k string"),
        ["user_id"],
        secret="s3",
    )
    assert (
        released.join(other, "user_id_pseudo").count() == 1
    )


from hypothesis import HealthCheck, given, settings, strategies as st

_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),   # quasi 1
        st.integers(0, 2),                        # quasi 2
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(_rows, st.sampled_from([2, 3, 5]))
def test_k_anonymity_model(spark, rows, k):
    """Model check: the survivor set is exactly the rows of combos with
    count >= k (Python recount), and the released frame is k-anonymous
    by its own recount — for any row multiset including NULL quasi
    values."""
    import collections

    df = spark.createDataFrame(
        [(i, z, y) for i, (z, y) in enumerate(rows)],
        "row_id long, zip string, birth_year int",
    )
    out = enforce_k_anonymity(df, ["zip", "birth_year"], k=k)
    kept = {r["row_id"] for r in out.collect()}
    counts = collections.Counter((z, y) for z, y in rows)
    want = {
        i for i, (z, y) in enumerate(rows) if counts[(z, y)] >= k
    }
    assert kept == want, (rows, k)
    assert rare_combinations(out, ["zip", "birth_year"], k).count() == 0


def test_sensitive_diversity_audit(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.privacy import (
        sensitive_diversity_audit,
    )

    rows = [
        # homogeneous: 3 members, one sensitive value
        ("10001", 1990, "flu"),
        ("10001", 1990, "flu"),
        ("10001", 1990, "flu"),
        # diverse: two values
        ("10002", 1991, "flu"),
        ("10002", 1991, "cold"),
        # NULL sensitive counts as a value: {NULL, flu} = 2 values
        ("10003", 1992, None),
        ("10003", 1992, "flu"),
        # all-NULL sensitive: one value -> homogeneous
        (None, 1990, None),
        (None, 1990, None),
    ]
    df = spark.createDataFrame(rows, "zip string, birth_year int, dx string")
    got = {
        (r["zip"], r["birth_year"]): r["n_sensitive_values"]
        for r in sensitive_diversity_audit(
            df, ["zip", "birth_year"], "dx", l=2
        ).collect()
    }
    assert got == {("10001", 1990): 1, (None, 1990): 1}
    # at l=3 the two-value groups are flagged too
    got3 = {
        (r["zip"], r["birth_year"])
        for r in sensitive_diversity_audit(
            df, ["zip", "birth_year"], "dx", l=3
        ).collect()
    }
    assert got3 == {
        ("10001", 1990), ("10002", 1991), ("10003", 1992), (None, 1990)
    }
    with pytest.raises(ValueError, match="l must be >= 2"):
        sensitive_diversity_audit(df, ["zip"], "dx", l=1)


def test_release_differencing_audit(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.privacy import (
        release_differencing_audit,
    )

    a = spark.createDataFrame(ROWS, SCHEMA)
    # drop ONE member of the 10001 cohort and the whole 10003
    # singleton; everything else identical
    b = a.filter(
        ~((F.col("zip") == "10001") & (F.col("payload") == "a"))
    ).filter(F.coalesce(F.col("zip"), F.lit("?")) != "10003")
    got = {
        (r["zip"], r["birth_year"]): (r["n_a"], r["n_b"], r["n_diff"])
        for r in release_differencing_audit(
            a, b, ["zip", "birth_year"], k=3
        ).collect()
    }
    # 10001: 3 vs 2 -> the dropped member is isolated by subtraction;
    # 10003: 1 vs 0 -> a one-sided combo audits the same way;
    # NULL zip and 10002 count equal on both sides -> silent
    assert got == {
        ("10001", 1990): (3, 2, 1),
        ("10003", 1992): (1, 0, 1),
    }
    # identical releases difference to nothing
    assert (
        release_differencing_audit(
            a, a, ["zip", "birth_year"], k=5
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="k must be >= 2"):
        release_differencing_audit(a, b, ["zip"], k=1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(_rows, _rows, st.sampled_from([2, 3]))
def test_release_differencing_model(spark, rows_a, rows_b, k):
    from collections import Counter

    from data_pipeline_project_using_telegram_and_aws_spark.operators.privacy import (
        release_differencing_audit,
    )

    two_col = "zip string, birth_year int"
    a = spark.createDataFrame(rows_a, two_col)
    b = spark.createDataFrame(rows_b, two_col)
    got = {
        (r["zip"], r["birth_year"]): (r["n_a"], r["n_b"], r["n_diff"])
        for r in release_differencing_audit(
            a, b, ["zip", "birth_year"], k=k
        ).collect()
    }
    ca = Counter(rows_a)
    cb = Counter(rows_b)
    want = {}
    for combo in set(ca) | set(cb):
        d = abs(ca.get(combo, 0) - cb.get(combo, 0))
        if 0 < d < k:
            want[combo] = (ca.get(combo, 0), cb.get(combo, 0), d)
    assert got == want
