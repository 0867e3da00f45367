"""Format-generic table interchange: Parquet / ORC / JSON-lines / CSV.

The lake's own zones are fixed (JSON raw, Parquet enriched —
``lake.py``), but a user switching engines also carries flat files in
whatever format the neighbor system speaks. This module is that edge:
one export/import pair per format, schema-first (imports never infer —
inference reads data twice and silently drifts types across engines).

Format notes, encoded here rather than in every caller:

- **parquet/orc**: the columnar pair — both keep types, nested structs,
  arrays; both serve predicate pushdown and column pruning from the
  scan (pinned for ORC in tests/test_interchange.py — same plan checks
  as the parquet ones in test_plan_hygiene.py). ORC matters because
  Hive-lineage warehouses hand it over.
- **json** (lines): keeps nesting, loses type width (everything
  re-enters through the declared schema); the raw-zone format.
- **csv**: flat strings only. Complex columns (arrays/structs/maps) are
  JSON-ENCODED per cell on export and decoded via ``from_json`` on
  import, so a CSV round-trip is lossless *given the schema* — the
  alternative (refusing complex columns) just pushes the same encode
  onto every caller. Headers on, explicit nullValue sentinel so empty
  string ≠ NULL.

Scale: export writes are partition-parallel like any DataFrame write;
``partition_by`` passes through to ``partitionBy`` for pruned layouts.
Nothing here touches the driver beyond the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")

# CSV cells hold strings; this sentinel distinguishes NULL from ""
_CSV_NULL = "\\N"


def _complex_fields(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
    ]


def export_table(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; CSV JSON-encodes complex
    columns (see module docstring)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown interchange format {fmt!r}; one of {FORMATS}")
    if fmt == "csv":
        for name in _complex_fields(df.schema):
            df = df.withColumn(name, F.to_json(name))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True).option("nullValue", _CSV_NULL)
    writer.format(fmt).save(path)


def import_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
) -> DataFrame:
    """Read ``path`` as ``fmt`` under the DECLARED ``schema`` (no
    inference); CSV decodes JSON-encoded complex columns back to their
    declared types."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown interchange format {fmt!r}; one of {FORMATS}")
    if fmt != "csv":
        return spark.read.schema(schema).format(fmt).load(path)
    complex_names = _complex_fields(schema)
    flat = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if f.name in complex_names else f.dataType,
                True,
            )
            for f in schema.fields
        ]
    )
    df = (
        spark.read.schema(flat)
        .option("header", True)
        .option("nullValue", _CSV_NULL)
        .format("csv")
        .load(path)
    )
    for f in schema.fields:
        if f.name in complex_names:
            df = df.withColumn(f.name, F.from_json(f.name, f.dataType))
    return df.select(*[f.name for f in schema.fields])
