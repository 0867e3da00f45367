"""Streaming contract enforcement: apply row-level data-quality rules
(`operators/contracts.py`'s dict forms) to every micro-batch, route
passing rows to the good sink and violating rows — stamped with WHICH
rule they broke — to a quarantine, never dropping data silently and
never killing the stream over a bad record (the `ingest.py` quarantine
stance, generalized from parse errors to semantic rules).

Row-level rules only (`not_null`, `accepted_values`, `bounds`): each
compiles to a codegen'd boolean column, so the gate is a projection +
two filtered writes per batch — no shuffle, no Python, no state.
Batch-level rules (`unique`, `row_count`, `referential`) are
deliberately excluded here: they are properties of a DATASET, not a
row, and belong to `enforce_contracts` on the batch/compaction side
where "reject the whole load" is a sane outcome. A `unique` check
inside a micro-batch would pass data that duplicates across batches —
a false guarantee; stateful cross-batch dedup already exists as
`streaming/windows.py`'s first-seen dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

_ROW_RULES = {"not_null", "accepted_values", "bounds"}


def row_violation_expr(rules: list[dict]) -> Column:
    """Array of names of the rules each row violates (empty = clean) —
    one codegen'd expression, reusable in batch jobs too."""
    if not rules:
        raise ValueError("row_violation_expr: no rules given")
    parts = []
    for r in rules:
        kind = r["rule"]
        if kind not in _ROW_RULES:
            raise ValueError(
                f"row_violation_expr: {kind!r} is not a row-level rule "
                f"(row-level: {sorted(_ROW_RULES)}); enforce it with "
                "check_contracts/enforce_contracts on the batch side"
            )
        if kind == "not_null":
            cond = F.col(r["col"]).isNull()
            label = f"not_null:{r['col']}"
        elif kind == "accepted_values":
            cond = ~F.col(r["col"]).isin(r["values"]) | F.col(
                r["col"]
            ).isNull()
            label = f"accepted_values:{r['col']}"
        else:  # bounds
            c = F.col(r["col"])
            cond = F.lit(False)
            if r.get("lo") is not None:
                cond = cond | (c < r["lo"])
            if r.get("hi") is not None:
                cond = cond | (c > r["hi"])
            label = f"bounds:{r['col']}"
        parts.append(F.when(cond, F.lit(label)))
    return F.array_compact(F.array(*parts))


def start_contract_gate_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    rules: list[dict],
    good_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream → per-batch split on the contract rules.
    Good rows land under ``good_path``, violators under
    ``quarantine_path`` with a ``violated`` array column naming every
    broken rule (the audit trail a re-ingest job filters on). Both
    writes are per-batch appends under the same checkpoint, so
    exactly-once delivery follows from the source progress log."""
    viol = row_violation_expr(rules)
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        marked = batch.withColumn("violated", viol).localCheckpoint(
            eager=True
        )
        (
            marked.filter(F.size("violated") == 0)
            .drop("violated")
            .write.mode("append")
            .parquet(good_path)
        )
        bad = marked.filter(F.size("violated") > 0)
        if bad.limit(1).count():
            bad.write.mode("append").parquet(quarantine_path)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
