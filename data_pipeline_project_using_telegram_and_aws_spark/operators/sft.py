"""SFT record assembly: rendered dialogs → (token_ids, loss_mask)
training records, via the segment route real SFT pipelines use —
tokenize each template segment SEPARATELY (chrome and turn texts),
then concatenate tokens and a parallel mask, rather than tokenizing
the whole text and mapping character offsets into token offsets
(boundary merges make that mapping tokenizer-specific; per-segment
tokenization sidesteps it by construction, at the cost of not merging
across segment boundaries — the standard trade, stated plainly).

Flow: `dialogs.render_dialogs_with_spans` → :func:`explode_loss_
segments` (one row per covering segment: chrome rows with
``is_loss=false``, turn-text rows flagged by role) → ANY tokenizer
over ``seg_text`` (the repo's BPE/unigram encode, a whitespace split,
an external model) → :func:`reassemble_sft_records` (per-dialog
flatten of tokens + same-shaped boolean mask). The segments COVER the
rendered text exactly — concatenating ``seg_text`` in order
reproduces ``dialog_text`` byte for byte (pinned), so no template
character escapes tokenization.

Scale: segmenting is a row-local fold + posexplode (rows × segments,
segments ≤ 2·turns+0); reassembly is one keyed shuffle whose collect
operand is the dialog's total token count — bounded upstream by the
dialog guard and DOWN here by an in-plan token-count guard
(`scale_rules.collected_group_max_rows` at 8 B/token), failing loudly
with the dialog named.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def explode_loss_segments(
    rendered: DataFrame,
    id_cols: list[str] | None = None,
    spans_col: str = "spans",
    text_col: str = "dialog_text",
    loss_roles: list[str] | None = None,
) -> DataFrame:
    """One row per covering segment of the rendered text:
    (id..., seg_idx, role, is_loss, seg_text). Chrome (role headers,
    separators) becomes ``role=NULL, is_loss=false`` segments; turn
    texts carry their role and ``is_loss = role ∈ loss_roles`` (all
    roles loss-on when ``loss_roles`` is None). Empty segments (an
    empty turn text, adjacent chrome) are dropped — they contribute no
    tokens. Segments partition the text: concatenation in ``seg_idx``
    order reproduces ``text_col`` exactly."""
    ids = id_cols or ["user_id", "dialog_id"]
    text = F.col(text_col)
    zero = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array()
        .cast(
            "array<struct<role:string,is_loss:boolean,"
            "seg_start:long,seg_end:long>>"
        )
        .alias("segs"),
    )
    loss_of = (
        (lambda role: F.lit(True))
        if loss_roles is None
        else (lambda role: role.isin(*loss_roles))
    )

    def fold(acc, s):
        chrome = F.struct(
            F.lit(None).cast("string").alias("role"),
            F.lit(False).alias("is_loss"),
            acc["off"].alias("seg_start"),
            s["text_start"].alias("seg_end"),
        )
        turn = F.struct(
            s["role"].alias("role"),
            loss_of(s["role"]).alias("is_loss"),
            s["text_start"].alias("seg_start"),
            s["text_end"].alias("seg_end"),
        )
        return F.struct(
            s["text_end"].alias("off"),
            F.concat(acc["segs"], F.array(chrome, turn)).alias("segs"),
        )

    folded = F.aggregate(F.col(spans_col), zero, fold)
    # trailing chrome (none under the standard template, but a custom
    # turn_sep suffix or rendered epilogue must not escape)
    segs = F.concat(
        folded["segs"],
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("role"),
                F.lit(False).alias("is_loss"),
                folded["off"].alias("seg_start"),
                F.length(text).cast("long").alias("seg_end"),
            )
        ),
    )
    out = rendered.select(
        *ids, text.alias("__text"), F.posexplode(segs).alias("seg_idx", "__s")
    ).filter(F.col("__s.seg_end") > F.col("__s.seg_start"))
    return out.select(
        *ids,
        "seg_idx",
        F.col("__s.role").alias("role"),
        F.col("__s.is_loss").alias("is_loss"),
        F.substring(
            F.col("__text"),
            (F.col("__s.seg_start") + 1).cast("int"),
            (F.col("__s.seg_end") - F.col("__s.seg_start")).cast("int"),
        ).alias("seg_text"),
    )


def reassemble_sft_records(
    seg_tokens: DataFrame,
    id_cols: list[str] | None = None,
    seg_idx_col: str = "seg_idx",
    tokens_col: str = "token_ids",
    is_loss_col: str = "is_loss",
    max_tokens_per_record: int | None = None,
) -> DataFrame:
    """Per dialog: (id..., token_ids, loss_mask, n_tokens,
    n_loss_tokens) — segments flattened in order, the mask parallel to
    the tokens (True exactly on loss segments' tokens). Input is the
    segment frame AFTER tokenization (any engine op that appended
    ``tokens_col`` per segment). The per-dialog collect is guarded
    in-plan at ``max_tokens_per_record`` total tokens (default from
    the 64 MB cost model at 8 B/token), dialog named."""
    ids = id_cols or ["user_id", "dialog_id"]
    if max_tokens_per_record is None:
        from ..functions.scale_rules import collected_group_max_rows

        max_tokens_per_record = collected_group_max_rows(bytes_per_row=8)
    sized = seg_tokens.withColumn(
        "__nt",
        F.sum(F.size(tokens_col)).over(Window.partitionBy(*ids)),
    )
    guard_msg = F.concat_ws(
        " ",
        F.lit("reassemble_sft_records: dialog"),
        *[
            F.concat(
                F.lit(f"{c}="),
                F.coalesce(F.col(c).cast("string"), F.lit("NULL")),
            )
            for c in ids
        ],
        F.lit("has"),
        F.col("__nt").cast("string"),
        F.lit(
            f"tokens > max_tokens_per_record={max_tokens_per_record}; "
            "split or truncate upstream"
        ),
    )
    sized = sized.filter(
        F.assert_true(
            F.col("__nt") <= F.lit(max_tokens_per_record), guard_msg
        ).isNull()
    ).drop("__nt")
    seg = F.struct(
        F.col(seg_idx_col).alias("i"),
        F.col(tokens_col).alias("t"),
        F.col(is_loss_col).alias("l"),
    )
    grouped = sized.groupBy(*ids).agg(
        F.array_sort(F.collect_list(seg)).alias("__segs")
    )
    toks = F.flatten(F.transform("__segs", lambda s: s["t"]))
    mask = F.flatten(
        F.transform(
            "__segs",
            lambda s: F.transform(s["t"], lambda _: s["l"]),
        )
    )
    return grouped.select(
        *ids,
        toks.alias("token_ids"),
        mask.alias("loss_mask"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            mask,
            F.lit(0).cast("long"),
            lambda acc, m: acc + m.cast("long"),
        ).alias("n_loss_tokens"),
    )
