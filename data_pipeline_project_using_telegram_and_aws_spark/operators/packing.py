"""Sequence packing: lay documents into fixed-token-budget training
sequences (the pretraining dataloader op — maximize tokens per sequence,
never split a document).

Scale design (100 TB): optimal bin packing is NP-hard and even greedy
first-fit is inherently sequential, so the distributed formulation packs
**locally within shards**, the way production pretraining pipelines do:

- shard: each document goes to ``pmod(xxhash64(id), n_shards)`` — a
  deterministic pseudo-random shuffle that also equalizes shard token
  mass (one hash shuffle, no coordination);
- order: within a shard, documents are laid out in md5(id) order — a
  reproducible random permutation (document order should not correlate
  with corpus order for training);
- pack: a running token total per shard (window cumsum) assigns each
  document to sequence ``floor(cum_before / budget)`` — the sequence
  where the document *starts*. A document never splits; a sequence can
  exceed the budget by at most one straddling document, so real token
  budgets are enforced as ``budget - max_doc_tokens`` headroom or by
  dropping docs longer than the budget (``strict``).

Everything is one shuffle (the shard hash) plus per-shard window work —
no global sort, no driver loop, no Python. Per-shard packing is
embarrassingly parallel at any corpus size; quality loss vs global
first-fit-decreasing is the accepted trade (measured fill ratios are the
``packing_stats`` output — observability instead of a claim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def default_token_count(text_col: str = "text") -> Column:
    """Whitespace token count — swap for a BPE-calibrated estimate via
    the ``n_tokens_col`` hook of :func:`pack_sequences`."""
    return F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))


def md5_shard(id_col: str, n_shards: int) -> Column:
    """Portable md5-derived shard id: first 6 hex digits of md5(id) as an
    integer, mod ``n_shards``. Weaker mixing than the default xxhash64 but
    reproducible verbatim in ANSI SQL (DuckDB:
    ``CAST('0x' || substr(md5(id), 1, 6) AS BIGINT) % n``) — use it when
    the packing layout itself must be oracle-checkable."""
    hex6 = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 6)
    return F.pmod(F.conv(hex6, 16, 10).cast("long"), F.lit(n_shards))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int | str = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
    strict: bool = False,
    shard: Column | None = None,
) -> DataFrame:
    """Assign every document a (shard, seq_id, seq_offset) packing slot.

    Output: input columns + ``n_tokens``, ``shard``, ``seq_id`` (dense
    per shard), ``seq_offset`` (token offset of the document inside its
    sequence, from the cumsum — so a writer can materialize the packed
    sequence without re-scanning). ``strict=True`` drops documents longer
    than the budget (otherwise an oversized document occupies its
    sequence alone and overflows it). ``shard`` overrides the default
    xxhash64 shard assignment (e.g. :func:`md5_shard` for SQL parity).

    ``n_shards`` defaults to a FIXED 64 — the default-arg layout is part
    of persisted artifacts' contract, so it must not drift with corpus
    size (round-4 briefly derived it by default; round-5 ADVICE reverted
    that: a default-arg caller would silently get a different shard
    layout than previously persisted sequences, plus an extra full pass).
    Pass ``n_shards="auto"`` to opt into deriving it from the
    probe-backed rule ``scale_rules.packing_n_shards`` (constant docs
    per shard; measured wall-time/fill trade in that module) via one
    ``count()`` of the input — do this for fresh corpora, never for
    re-packing against an existing layout.
    """
    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else default_token_count(text_col)
    )
    d = docs.withColumn("n_tokens", n_tok.cast("long"))
    if strict:
        d = d.filter(F.col("n_tokens") <= budget)
    if n_shards == "auto":
        if shard is not None:
            raise ValueError(
                "pack_sequences: n_shards='auto' is meaningless with an "
                "explicit shard column"
            )
        from ..functions.scale_rules import packing_n_shards

        n_shards = packing_n_shards(d.count())
    elif not isinstance(n_shards, int):
        raise ValueError(
            f"pack_sequences: n_shards must be an int or 'auto', got "
            f"{n_shards!r}"
        )
    if shard is None:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    d = d.withColumn("shard", shard.cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "__cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        d.withColumn(
            "seq_id", F.floor(F.col("__cum_before") / budget).cast("long")
        )
        .withColumn(
            "seq_offset",
            (F.col("__cum_before") - F.col("seq_id") * budget).cast("long"),
        )
        .drop("__cum_before")
    )


def materialize_sequences(
    packed: DataFrame,
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Collapse packing slots into the training sequences themselves:
    one row per (shard, seq_id) with the member documents' text joined
    in slot order — the artifact a dataloader actually reads.

    Plan: one aggregation keyed by (shard, seq_id) collecting
    (seq_offset, text) structs, sorted row-locally by offset (struct
    sort — no second shuffle), then joined with the separator. The
    groupBy rides the same shard partitioning the packing window
    created, so materialization adds one partial-agg'd shuffle of the
    already-packed rows and nothing else."""
    member = F.struct(F.col("seq_offset"), F.col(text_col).alias("t"))
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.array_sort(F.collect_list(member)).alias("__members"),
        )
        .select(
            "shard",
            "seq_id",
            "n_docs",
            "seq_tokens",
            F.array_join(
                F.transform(F.col("__members"), lambda m: m["t"]), sep
            ).alias("seq_text"),
        )
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Fill-ratio observability per (shard, seq_id): token count, doc
    count, fill vs budget, and whether the sequence overflows (possible
    only via a straddling document — bounded by the longest document)."""
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("seq_tokens") / budget, 4)
        )
        .withColumn("overflows", F.col("seq_tokens") > budget)
    )


def shuffle_epoch_order(
    sequences: DataFrame,
    seed: int,
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic per-epoch reshuffle of packed training sequences:
    appends ``epoch_shard`` and ``epoch_pos`` — a seeded pseudo-random
    permutation of the whole corpus, different per seed, identical
    across reruns and input partition layouts.

    Why an operator: packing fixes ONE order (md5(id) within shard);
    training wants a fresh global order every epoch without touching
    document bytes. Hashing (seed, shard, seq_id) gives each epoch an
    independent permutation that is a pure function of the data + seed
    — reproducible resume mid-epoch, no RNG state to checkpoint, and
    computable on the id columns alone.

    Scale shape: NO global sort. ``epoch_shard`` is a hash (one keyed
    shuffle); ``epoch_pos`` is a per-epoch-shard window over ~N/shards
    rows — the same bounded-operand pattern :func:`pack_sequences`
    uses. A dataloader reads shard directories in epoch_pos order
    (``export_training_shards`` with ``order_col='epoch_pos'`` writes
    exactly that layout); cross-shard order is the reader's shard
    interleave, which the hash already randomized.

    ``n_shards`` defaults to the input's shard count (so each epoch
    re-deals the same deck across the same number of readers)."""
    if n_shards is None:
        n_shards = sequences.select(
            F.countDistinct("shard").alias("n")
        ).collect()[0]["n"]
        if n_shards == 0:
            raise ValueError("shuffle_epoch_order: empty input")
    key = F.xxhash64(F.lit(seed), F.col("shard"), F.col("seq_id"))
    out = sequences.withColumn(
        "epoch_shard", F.pmod(key, F.lit(n_shards)).cast("long")
    )
    w = Window.partitionBy("epoch_shard").orderBy(
        # Total order: hash first (the randomness), then the unique
        # (shard, seq_id) pair so ties cannot make epoch_pos ambiguous.
        F.xxhash64(F.lit(seed + 1), F.col("shard"), F.col("seq_id")),
        F.col("shard"),
        F.col("seq_id"),
    )
    return out.withColumn(
        "epoch_pos", (F.row_number().over(w) - 1).cast("long")
    )


def materialize_token_sequences(
    packed: DataFrame,
    tokens_col: str = "token_ids",
    mask_col: str | None = None,
) -> DataFrame:
    """:func:`materialize_sequences` for TOKEN records (the
    `operators/sft.py` handoff): one row per (shard, seq_id) with the
    member documents' token arrays flattened in slot order — and, with
    ``mask_col``, the parallel loss mask flattened by the SAME ordered
    member list, so tokens and mask cannot disagree after packing
    (same length, same order; pinned). Same plan as the text
    materializer: one partial-agg'd aggregation riding the packing
    shard partitioning, row-local struct sort, no second shuffle."""
    fields = [F.col("seq_offset"), F.col(tokens_col).alias("t")]
    if mask_col is not None:
        fields.append(F.col(mask_col).alias("m"))
    member = F.struct(*fields)
    grouped = packed.groupBy("shard", "seq_id").agg(
        F.array_sort(F.collect_list(member)).alias("__members"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    toks = F.flatten(F.transform("__members", lambda s: s["t"]))
    cols = [
        F.col("shard"),
        F.col("seq_id"),
        toks.alias(tokens_col),
        F.size(toks).alias("n_tokens"),
        F.col("n_docs"),
    ]
    if mask_col is not None:
        cols.insert(
            3,
            F.flatten(
                F.transform("__members", lambda s: s["m"])
            ).alias(mask_col),
        )
    return grouped.select(*cols)


def export_training_shards(
    sequences: DataFrame,
    path: str,
    fmt: str = "parquet",
    shard_col: str = "shard",
    order_col: str = "seq_id",
) -> DataFrame:
    """Write materialized sequences as the dataloader handoff artifact:
    one directory per packing shard (``shard=N/`` partitions, each
    written by its own task — writer parallelism = shard count, the
    same dial :func:`pack_sequences` already sized) plus a one-row-per-
    shard MANIFEST returned to the caller and written next to the data
    (``_manifest`` subdirectory, JSON lines).

    The manifest carries what a training launcher actually schedules
    on: per-shard sequence/document/token counts and the global totals
    (as a ``total`` row with shard = -1) — so the loader can size
    epochs and balance readers without opening a single data file.
    Sequence order inside a shard is ``order_col`` (default ``seq_id``,
    the deterministic packing order; pass ``shard_col='epoch_shard'``,
    ``order_col='epoch_pos'`` to export a :func:`shuffle_epoch_order`
    layout instead); the parquet sort-within-partition makes re-reads
    reproduce it."""
    seqs = sequences.select(
        shard_col, order_col, "n_docs", "seq_tokens", "seq_text"
    )
    (
        seqs.repartition(shard_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .format(fmt)
        .save(path)
    )
    per_shard = seqs.groupBy(F.col(shard_col).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("seq_tokens").alias("n_tokens"),
        _content_hash(order_col).alias("content_hash"),
    )
    total = per_shard.agg(
        F.lit(-1).cast("long").alias("shard"),
        F.sum("n_sequences").alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("content_hash").alias("content_hash"),
    )
    manifest = per_shard.unionByName(total).orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/_manifest")
    return manifest


def _content_hash(order_col: str) -> Column:
    """Commutative per-shard content fingerprint: the plain sum of
    per-sequence ``xxhash64(order, text)`` values. Commutativity makes
    it partial-aggregatable (O(1) state per task, no shard-sized
    collect) and lets the total row be the sum of shard rows; it is an
    INTEGRITY check (truncation, corruption, wrong-file reads), not a
    cryptographic one — an adversary could craft colliding edits, a
    broken copy job cannot. The sum runs in decimal(38,0): ANSI mode
    (this engine's default) raises on long-sum overflow, which random
    int64 hashes would hit within a few thousand rows."""
    return F.sum(
        F.xxhash64(F.col(order_col), F.col("seq_text")).cast(
            "decimal(38,0)"
        )
    )


def verify_training_shards(
    spark,
    path: str,
    fmt: str = "parquet",
    shard_col_name: str = None,
) -> list[dict]:
    """Re-derive every manifest row from the shard data and return the
    mismatches (empty list = intact): the dataloader's pre-flight
    check against truncated/partial/clobbered exports. Reads the data
    once with the same aggregation shape the export used."""
    import json as _json
    from pathlib import Path as _Path

    manifest = {}
    for f in _Path(f"{path}/_manifest").glob("part-*"):
        for line in f.read_text().splitlines():
            row = _json.loads(line)
            manifest[int(row["shard"])] = row
    if not manifest:
        raise ValueError(f"verify_training_shards: no manifest at {path}")
    data = spark.read.format(fmt).load(path)
    shard_col = shard_col_name or data.columns[-1]  # the partition col
    order_col = data.columns[0]
    got = {
        int(r["shard"]): r
        for r in data.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("seq_tokens").alias("n_tokens"),
            _content_hash(order_col).alias("content_hash"),
        )
        .collect()
    }
    mismatches = []
    for shard, want in manifest.items():
        if shard == -1:
            continue
        have = got.get(shard)
        for field in ("n_sequences", "n_docs", "n_tokens", "content_hash"):
            w = int(want[field])
            h = None if have is None else int(have[field])
            if h != w:
                mismatches.append(
                    {"shard": shard, "field": field, "manifest": w,
                     "data": h}
                )
    for shard in set(got) - set(manifest):
        mismatches.append(
            {"shard": shard, "field": "presence", "manifest": None,
             "data": "unmanifested shard"}
        )
    return mismatches


def affected_shards(
    packed: DataFrame,
    doc_ids: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard) — the distinct shards whose packed layout changes when
    the given documents are removed (or re-admitted): the erasure
    blast-radius query.

    Shard assignment is ``pmod(xxhash64(id), n_shards)`` — a pure
    function of the document id — and packing order inside a shard is
    md5(id), so removing a document perturbs ONLY its own shard's
    cumsum; every other shard's sequences are byte-identical on a
    re-pack. That locality is what makes right-to-erasure over an
    exported training set a partition rewrite instead of a corpus
    rewrite: re-pack, re-materialize, and :func:`reexport_shards` just
    these shards. ``doc_ids`` is the erasure list (tiny by nature) —
    broadcast, so the packed table never shuffles."""
    ids = doc_ids.select(id_col).distinct()
    return packed.join(F.broadcast(ids), id_col).select("shard").distinct()


def reexport_shards(
    sequences: DataFrame,
    path: str,
    shards: list[int],
    fmt: str = "parquet",
    shard_col: str = "shard",
    order_col: str = "seq_id",
) -> DataFrame:
    """Rewrite ONLY the given shard partitions of an
    :func:`export_training_shards` artifact and patch their manifest
    rows — the surgical follow-up to an erasure (or any single-shard
    fix): unaffected shard files are never opened, their manifest rows
    (content_hash included) carry over verbatim, and
    :func:`verify_training_shards` stays green against the patched
    manifest.

    ``sequences`` is the RE-materialized table (post-erasure re-pack of
    the same layout); only its rows for ``shards`` are read. A shard
    whose documents were all erased is removed: its partition directory
    is deleted (dynamic overwrite never touches partitions it writes no
    rows for — leaving the stale directory would resurrect erased text
    on the next read; rename/delete atomicity caveat as per the
    filesystem note in ``sources/lake.py``) and its manifest row is
    dropped. ``shards`` is driver-side but bounded by the erasure
    list's blast radius, never the corpus. Returns the patched
    manifest (same contract as the exporter's return).

    Crash window, stated: the partition rewrite and the manifest patch
    are two steps. A crash between them leaves
    :func:`verify_training_shards` RED on exactly the rewritten shards
    (the manifest still carries their old rows) — loud, never silent —
    and re-running this call with the same arguments converges: the
    rewrite is a deterministic overwrite and the patch recomputes from
    the same rows."""
    import json as _json
    import shutil as _shutil
    from decimal import Decimal as _Decimal
    from pathlib import Path as _Path

    if not shards:
        raise ValueError("reexport_shards: empty shard list")
    shards = [int(s) for s in shards]
    manifest_rows = {}
    for f in _Path(f"{path}/_manifest").glob("part-*"):
        for line in f.read_text().splitlines():
            row = _json.loads(line)
            manifest_rows[int(row["shard"])] = row
    if not manifest_rows:
        raise ValueError(
            f"reexport_shards: no manifest at {path} — export the full "
            "artifact first (export_training_shards)"
        )
    target = sequences.filter(F.col(shard_col).isin(shards)).select(
        shard_col, order_col, "n_docs", "seq_tokens", "seq_text"
    )
    (
        target.repartition(shard_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(shard_col)
        .format(fmt)
        .save(path)
    )
    fresh = {
        int(r["shard"]): r.asDict()
        for r in target.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("seq_tokens").alias("n_tokens"),
            _content_hash(order_col).alias("content_hash"),
        )
        .collect()
    }
    for gone in set(shards) - set(fresh):
        part_dir = _Path(path) / f"{shard_col}={gone}"
        if part_dir.exists():
            _shutil.rmtree(part_dir)
    merged = {
        s: r
        for s, r in manifest_rows.items()
        if s != -1 and s not in shards
    }
    merged.update(fresh)
    rows = [
        (
            s,
            int(r["n_sequences"]),
            int(r["n_docs"]),
            int(r["n_tokens"]),
            _Decimal(int(r["content_hash"])),
        )
        for s, r in sorted(merged.items())
    ]
    rows.append(
        (
            -1,
            sum(r[1] for r in rows),
            sum(r[2] for r in rows),
            sum(r[3] for r in rows),
            _Decimal(sum(int(r[4]) for r in rows)),
        )
    )
    rows.sort()
    manifest = sequences.sparkSession.createDataFrame(
        rows,
        "shard long, n_sequences long, n_docs long, n_tokens long, "
        "content_hash decimal(38,0)",
    )
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/_manifest")
    return manifest
