"""Data-quality contracts: declarative expectations over a DataFrame,
evaluated in as few passes as the rule mix allows, reported as a
violations table, and optionally enforced (raise) — the dbt-test /
Great-Expectations shape as engine operators, for gating ingest and
inter-stage handoffs (a packing job should fail loudly on duplicate
doc_ids, not tile them twice).

Rule forms (plain dicts — serializable, diffable, no DSL):

- ``{"rule": "not_null", "col": c}``
- ``{"rule": "unique", "cols": [c, ...]}``
- ``{"rule": "accepted_values", "col": c, "values": [...]}``  (NULL is
  a violation — combine with not_null being absent if NULLs are fine)
- ``{"rule": "bounds", "col": c, "lo": x, "hi": y}``  (either side
  optional; NULLs don't violate bounds — that's not_null's job)
- ``{"rule": "row_count", "lo": n, "hi": m}``
- ``{"rule": "referential", "col": c, "to": other_df, "to_col": c2}``
- ``{"rule": "schema", "expect": {col: dtype, ...}}``  (exact dtype
  strings as ``df.dtypes`` reports them; missing columns and dtype
  drift both violate — evaluated from metadata, zero scan)

Execution shape: every scalar rule (everything except ``unique`` and
``referential``) compiles to one conditional-count expression in a
SINGLE aggregation over one scan. ``unique`` adds one exact
count-distinct on its key (a keyed shuffle — the price of an exact
uniqueness guarantee; at 100 TB run it on the key columns only, which
this does via column pruning). ``referential`` adds one left-anti count
against the foreign side (broadcast when small — Catalyst's choice).
Nothing ever collects rows; the report carries counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ContractViolation(AssertionError):
    """Raised by :func:`enforce_contracts`; carries the violations rows."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        super().__init__(
            "data contract violated: "
            + "; ".join(
                f"{f['rule']}({f['subject']}): {f['violations']}"
                for f in failures
            )
        )


def _subject(rule: dict) -> str:
    if "col" in rule:
        return rule["col"]
    if "cols" in rule:
        return ",".join(rule["cols"])
    return "*"


def check_contracts(df: DataFrame, rules: list[dict]) -> list[dict]:
    """Evaluate every rule; returns one dict per rule:
    ``{"rule", "subject", "violations", "ok"}`` (violations = offending
    row count, or the |count − bound| overage for row_count). Driver
    output is rule-sized, never row-sized."""
    if not rules:
        raise ValueError("check_contracts: no rules given")
    scalar_exprs = []
    scalar_idx: list[int] = []
    results: list[dict | None] = [None] * len(rules)
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            cond = F.col(r["col"]).isNull()
        elif kind == "accepted_values":
            cond = ~F.col(r["col"]).isin(r["values"]) | F.col(
                r["col"]
            ).isNull()
        elif kind == "bounds":
            c = F.col(r["col"])
            cond = F.lit(False)
            if r.get("lo") is not None:
                cond = cond | (c < r["lo"])
            if r.get("hi") is not None:
                cond = cond | (c > r["hi"])
        elif kind == "row_count":
            scalar_exprs.append(F.count(F.lit(1)).alias(f"__r{i}"))
            scalar_idx.append(i)
            continue
        elif kind == "schema":
            dtypes = dict(df.dtypes)
            bad = sum(
                1
                for c, t in r["expect"].items()
                if dtypes.get(c) != t
            )
            results[i] = {
                "rule": "schema",
                "subject": ",".join(sorted(r["expect"])),
                "violations": bad,
            }
            continue
        elif kind == "unique":
            # COUNT(DISTINCT ...) skips rows with a NULL key column, so
            # exclude them from the total too: NULL keys are not_null's
            # contract, not a duplicate.
            keyed = df.select(*r["cols"])
            for c in r["cols"]:
                keyed = keyed.filter(F.col(c).isNotNull())
            total, distinct = keyed.agg(
                F.count(F.lit(1)).alias("t"),
                F.count_distinct(*[F.col(c) for c in r["cols"]]).alias("d"),
            ).collect()[0]
            results[i] = {
                "rule": "unique",
                "subject": _subject(r),
                "violations": int(total - distinct),
            }
            continue
        elif kind == "referential":
            missing = (
                df.select(F.col(r["col"]))
                .filter(F.col(r["col"]).isNotNull())
                .join(
                    r["to"].select(
                        F.col(r["to_col"]).alias(r["col"])
                    ).distinct(),
                    r["col"],
                    "left_anti",
                )
                .count()
            )
            results[i] = {
                "rule": "referential",
                "subject": _subject(r),
                "violations": int(missing),
            }
            continue
        else:
            raise ValueError(f"check_contracts: unknown rule {kind!r}")
        scalar_exprs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__r{i}")
        )
        scalar_idx.append(i)
    if scalar_exprs:
        row = df.agg(*scalar_exprs).collect()[0]
        for i in scalar_idx:
            r = rules[i]
            v = int(row[f"__r{i}"] or 0)
            if r["rule"] == "row_count":
                n = v
                over = 0
                if r.get("lo") is not None and n < r["lo"]:
                    over = r["lo"] - n
                if r.get("hi") is not None and n > r["hi"]:
                    over = n - r["hi"]
                v = over
            results[i] = {
                "rule": r["rule"],
                "subject": _subject(r),
                "violations": v,
            }
    out = []
    for res in results:
        assert res is not None
        res["ok"] = res["violations"] == 0
        out.append(res)
    return out


def enforce_contracts(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Gate form: returns ``df`` unchanged when every rule holds, raises
    :class:`ContractViolation` (listing every failing rule and its
    count) otherwise — put it between pipeline stages."""
    report = check_contracts(df, rules)
    failures = [r for r in report if not r["ok"]]
    if failures:
        raise ContractViolation(failures)
    return df
