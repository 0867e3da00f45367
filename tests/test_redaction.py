from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.redaction import (
    redact_pii,
    redaction_summary,
)


def _rows(spark):
    return spark.createDataFrame(
        [
            (0, "contact alice@example.com or bob.smith+x@mail.co.uk now"),
            (1, "call +1 (415) 555-0134 today"),
            (2, "server at 10.0.42.7 and backup 192.168.1.254"),
            (3, "ssn 123-45-6789 on file"),
            (4, "clean document with no identifiers"),
            (5, "mixed a@b.io 123-45-6789 10.1.1.1"),
        ],
        ["doc_id", "text"],
    )


def test_redact_counts_and_scrub(spark):
    out = {r["doc_id"]: r for r in redact_pii(_rows(spark)).collect()}
    assert out[0]["n_email"] == 2
    assert "[EMAIL]" in out[0]["text_redacted"]
    assert "@" not in out[0]["text_redacted"]
    assert out[1]["n_phone"] == 1
    assert "555" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 2
    assert "10.0.42.7" not in out[2]["text_redacted"]
    assert out[3]["n_ssn"] == 1
    assert "6789" not in out[3]["text_redacted"]
    # clean row untouched, zero counts
    assert out[4]["text_redacted"] == out[4]["text"]
    assert all(out[4][f"n_{c}"] == 0 for c in ("email", "phone", "ipv4", "ssn"))
    # counts measured pre-replacement: every category sees its own match
    assert out[5]["n_email"] == 1 and out[5]["n_ssn"] == 1
    assert out[5]["n_ipv4"] == 1


def test_redaction_summary(spark):
    summary = redaction_summary(redact_pii(_rows(spark))).collect()[0]
    assert summary["total_email"] == 3 and summary["docs_email"] == 2
    assert summary["total_ssn"] == 2 and summary["docs_ssn"] == 2
    assert summary["docs_phone"] == 1


def test_redacted_corpus_is_pii_free(spark):
    redacted = redact_pii(_rows(spark))
    again = redact_pii(
        redacted.select("doc_id", redacted["text_redacted"].alias("text"))
    )
    residual = redaction_summary(again).collect()[0]
    assert residual["total_email"] == 0
    assert residual["total_ssn"] == 0
    assert residual["total_ipv4"] == 0


class TestPseudonymize:
    def test_deterministic_and_referentially_intact(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.redaction import (
            pseudonymize,
        )

        users = spark.createDataFrame(
            [(1, "alice"), (2, "bob"), (None, "carol")], ["user_id", "name"]
        )
        events = spark.createDataFrame(
            [(1, "click"), (1, "view"), (2, "click")], ["user_id", "event"]
        )
        pu = pseudonymize(users, ["user_id"], secret="k1")
        pe = pseudonymize(events, ["user_id"], secret="k1")
        # raw column gone, surrogate present
        assert "user_id" not in pu.columns and "user_id_pseudo" in pu.columns
        # the join still works and reproduces the original cardinalities
        joined = pe.join(pu, "user_id_pseudo")
        assert joined.count() == 3
        # same secret => same surrogate across runs; different secret differs
        a = {r["name"]: r["user_id_pseudo"] for r in pu.collect()}
        b = {
            r["name"]: r["user_id_pseudo"]
            for r in pseudonymize(users, ["user_id"], secret="k1").collect()
        }
        c = {
            r["name"]: r["user_id_pseudo"]
            for r in pseudonymize(users, ["user_id"], secret="k2").collect()
        }
        assert a == b
        assert a["alice"] != c["alice"]
        # NULL stays NULL; non-nulls are distinct hex of the asked length
        assert a["carol"] is None
        assert a["alice"] != a["bob"] and len(a["alice"]) == 16

    def test_validation(self, spark):
        import pytest as _pytest

        from data_pipeline_project_using_telegram_and_aws_spark.operators.redaction import (
            pseudonymize,
        )

        df = spark.createDataFrame([(1,)], ["x"])
        with _pytest.raises(ValueError):
            pseudonymize(df, [], "k")
        with _pytest.raises(ValueError):
            pseudonymize(df, ["x"], "")
        with _pytest.raises(ValueError):
            pseudonymize(df, ["x"], "k", length=4)

    def test_projection_only_plan(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.redaction import (
            pseudonymize,
        )

        df = spark.createDataFrame([(1, "a")], ["user_id", "v"])
        plan = (
            pseudonymize(df, ["user_id"], "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
