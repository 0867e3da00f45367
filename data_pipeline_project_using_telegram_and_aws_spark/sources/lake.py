"""The two lake zones (raw JSON / enriched Parquet) and the catalog layer.

Mirrors the reference's medallion layout (SURVEY.md §1.1):

- raw zone: one JSON document per message under
  ``raw/telegram/context_date={d}/`` (reference ipynb:330) — here written
  by Spark as JSON-lines files per partition directory, same layout
  semantics, engine-managed file counts.
- enriched zone: compacted Parquet under
  ``enriched/telegram/context_date={d}/`` (ipynb:596-597), registered as a
  partitioned external table (the Athena DDL, ipynb:732-750).

Improvements over the reference, deliberate (SURVEY §2.9 ST4): writes to
the enriched zone use *dynamic partition overwrite*, so re-running a day is
idempotent (the reference would duplicate output).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import RAW_UPDATE_SCHEMA


class TelegramLake:
    """Paths + IO for one logical pipeline instance."""

    def __init__(self, root: str, chat_id: int | None = None):
        self.root = root.rstrip("/")
        self.raw_path = f"{self.root}/raw/telegram"
        self.enriched_path = f"{self.root}/enriched/telegram"
        self.chat_id = chat_id
        self._registered: set[str] = set()

    # --- raw zone ---------------------------------------------------------

    def write_raw(self, updates: DataFrame) -> None:
        """Append updates into the raw zone, partitioned by arrival date.

        ``context_date`` is *processing time* (reference ipynb:310-311: the
        partition key is arrival date, event time is preserved separately in
        ``message.date`` — the two-timeline model, SURVEY §2.9 ST3).
        """
        (
            updates.withColumn("context_date", F.current_date())
            .write.mode("append")
            .partitionBy("context_date")
            .json(self.raw_path)
        )

    def read_raw(self, spark: SparkSession, context_date: dt.date | str | None = None) -> DataFrame:
        """Read the raw zone; a date filter prunes to one partition
        (the S3-prefix listing at ipynb:572, done by Catalyst here)."""
        from pyspark.sql import types as T

        # fresh StructType each call — StructType.add mutates in place
        schema = T.StructType(
            list(RAW_UPDATE_SCHEMA.fields)
            + [T.StructField("context_date", T.DateType())]
        )
        df = spark.read.schema(schema).json(self.raw_path)
        if context_date is not None:
            df = df.filter(F.col("context_date") == F.lit(str(context_date)))
        return df

    # --- enriched zone ----------------------------------------------------

    def write_enriched(self, flat: DataFrame, files_per_partition: int = 1) -> None:
        """Write flattened rows, partitioned by ``context_date``, compacted.

        The default keeps the reference's 1-file-per-day invariant
        (ipynb:596: one compacted Parquet per partition). At 100 TB a single
        file per day serializes the write, so callers pass a
        ``files_per_partition`` sized from input bytes (SURVEY §7 risk 2).
        Dynamic partition overwrite makes day re-runs idempotent.
        """
        from ..operators.compaction import compact_by_partition

        compacted = compact_by_partition(
            flat, "context_date", files_per_partition=files_per_partition
        )
        (
            compacted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("context_date")
            .parquet(self.enriched_path)
        )
        # overwrite replaces files under any already-registered view; a temp
        # view freezes its file listing at registration time, so refresh the
        # path cache AND re-register views (the MSCK-REPAIR analogue)
        spark = flat.sparkSession
        spark.catalog.refreshByPath(self.enriched_path)
        for name in self._registered:
            self.read_enriched(spark).createOrReplaceTempView(name)

    def read_enriched(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.enriched_path)

    def register_table(self, spark: SparkSession, name: str = "telegram") -> None:
        """Catalog layer (SURVEY §2.1 S9): expose the enriched zone as the
        ``telegram`` table — the Athena ``CREATE EXTERNAL TABLE`` +
        partition-discovery analogue. Partition discovery happens on read
        (Spark infers ``context_date=`` directories); a view keeps this
        zero-copy and always-fresh without a metastore dependency."""
        self.read_enriched(spark).createOrReplaceTempView(name)
        self._registered.add(name)
