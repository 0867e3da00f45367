"""Sliced model evaluation: exact AUC per group in one pass — the
"is the quality classifier fair across languages/sources" check that a
single corpus-level number hides (a 0.95 global AUC can hide a 0.6 on
the smallest language; sliced AUC is how that surfaces before the
filter silently skews the corpus mixture).

Exact, not sampled: AUC via the Mann-Whitney U statistic,
``(Σ avg-ranks of positives − n₊(n₊+1)/2) / (n₊ · n₋)``, with proper
tie handling (average ranks). Plan: one keyed shuffle on the group,
two windows riding the same sort (rank within group, tie counts within
(group, score)), one aggregation — no pairwise expansion (the naive
AUC-as-pair-count is O(n²) per group; ranks make it O(n log n) in the
sort). Degenerate groups (one class only) report NULL AUC instead of a
misleading number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def auc_by_group(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    by: str,
) -> DataFrame:
    """(group, n_pos, n_neg, auc): exact ROC-AUC of ``score_col``
    against binary ``label_col`` (0/1 or boolean) per group; NULL auc
    where a group has a single class. Rows with NULL label or score
    are excluded."""
    d = scored.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        F.col(by),
        F.col(label_col).cast("double").alias("__y"),
        F.col(score_col).cast("double").alias("__s"),
    )
    w_ord = Window.partitionBy(by).orderBy("__s")
    w_tie = Window.partitionBy(by, "__s")
    ranked = d.withColumn(
        "__avg_rank",
        # rank() is the min rank of a tie run; the average rank of the
        # run is min + (ties - 1) / 2
        F.rank().over(w_ord)
        + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0,
    )
    agg = ranked.groupBy(by).agg(
        F.sum(F.when(F.col("__y") == 1.0, F.col("__avg_rank"))).alias(
            "__rank_sum"
        ),
        F.sum(F.when(F.col("__y") == 1.0, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__y") == 0.0, 1).otherwise(0)).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (
                F.col("__rank_sum")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    return agg.select(by, "n_pos", "n_neg", auc.alias("auc"))


def calibration_report(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    bins: int = 10,
) -> DataFrame:
    """(bin, bin_lo, bin_hi, n, mean_score, frac_positive, gap): the
    reliability table behind a calibration curve — AUC says the model
    RANKS well; this says whether 0.9 MEANS 90% (it must, before
    `quality_filter` thresholds or `temperature_sample` exponents are
    read as probabilities). ``gap`` = mean_score − frac_positive per
    equi-width score bin; |gap| summed n-weighted is expected
    calibration error, left to the caller's tolerance.

    One aggregation over one scan; scores outside [0, 1] raise (they
    are not probabilities — calibrate after a sigmoid, not before)."""
    if bins < 2:
        raise ValueError("calibration_report: bins >= 2")
    c = F.col(score_col)
    guard = F.assert_true(
        (c >= 0.0) & (c <= 1.0),
        F.lit("calibration_report: scores must lie in [0, 1]"),
    )
    idx = F.least(F.floor(c * bins).cast("long"), F.lit(bins - 1))
    return (
        scored.filter(
            F.col(label_col).isNotNull() & c.isNotNull() & guard.isNull()
        )
        .groupBy(idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(c), 6).alias("mean_score"),
            F.round(
                F.avg(F.col(label_col).cast("double")), 6
            ).alias("frac_positive"),
        )
        .select(
            "bin",
            F.round(F.col("bin") / bins, 6).alias("bin_lo"),
            F.round((F.col("bin") + 1) / bins, 6).alias("bin_hi"),
            "n",
            "mean_score",
            "frac_positive",
            F.round(
                F.col("mean_score") - F.col("frac_positive"), 6
            ).alias("gap"),
        )
        .orderBy("bin")
    )


def tokenizer_fairness_report(
    docs: DataFrame,
    encoded: DataFrame,
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, total_chars, total_pieces, pieces_per_char,
    relative_cost): how expensive the tokenizer makes each slice of the
    corpus — the fertility/equity check for a trained vocabulary
    (a BPE fit on English famously charges other scripts 2-4× the
    pieces per character, which silently taxes their effective context
    length and training weight). ``relative_cost`` is the slice's
    pieces-per-char over the corpus-wide pieces-per-char; 1.0 = parity.

    Input: the documents and any encoder output carrying ``n_pieces``
    (`bpe_encode`, `unigram_encode`, `encode_documents`' token count).
    One join keyed by id + one aggregation."""
    joined = docs.select(
        F.col(id_col), F.col(by), F.length(text_col).alias("__chars")
    ).join(encoded.select(id_col, "n_pieces"), id_col)
    per = joined.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.sum("n_pieces").alias("total_pieces"),
    )
    total = per.agg(
        (F.sum("total_pieces") / F.sum("total_chars")).alias("__corpus_ppc")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn(
            "pieces_per_char",
            F.round(F.col("total_pieces") / F.col("total_chars"), 6),
        )
        .withColumn(
            "relative_cost",
            F.round(F.col("pieces_per_char") / F.col("__corpus_ppc"), 4),
        )
        .drop("__corpus_ppc")
        .orderBy(by)
    )


def agreement_report(
    labeled: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    by: str | None = None,
    max_labels: int = 256,
) -> DataFrame:
    """Inter-annotator agreement per slice: (by?, n, observed_agreement,
    expected_agreement, kappa) — Cohen's κ between two label columns
    (Cohen 1960), the label-quality check a raw percent-agreement
    hides (two raters who both say "good" 95% of the time agree 90%+
    by CHANCE; κ scores only the agreement beyond that).

    Rows where either label is NULL are excluded (an abstention is not
    a judgment; report abstention rates separately). Slices where
    expected agreement is 1 (both raters constant — κ is 0/0) report
    NULL kappa instead of inventing a number.

    Plan: one partial-agg'd groupBy on (slice, label_a, label_b) —
    operand ≤ slices × |alphabet|², never row-sized — then a
    per-slice row-local fold over the collected cell list. The
    collect is bounded by |alphabet|² and GUARDED in-plan at
    ``max_labels``² cells (the `collected_group_max_rows` stance): a
    thousand-label "alphabet" means a free-text column was passed by
    mistake, and the error names the slice."""
    keys = [by] if by else []
    cells = (
        labeled.filter(
            F.col(rater_a_col).isNotNull()
            & F.col(rater_b_col).isNotNull()
        )
        .groupBy(
            *keys,
            F.col(rater_a_col).cast("string").alias("__la"),
            F.col(rater_b_col).cast("string").alias("__lb"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # in-plan alphabet guard: the (slice) cell-count window reuses the
    # upcoming groupBy exchange on a prefix key
    cells = cells.withColumn(
        "__ncells",
        F.count(F.lit(1)).over(Window.partitionBy(*keys or [F.lit(0)])),
    ).filter(
        F.assert_true(
            F.col("__ncells") <= F.lit(max_labels * max_labels),
            F.concat_ws(
                " ",
                F.lit(
                    "agreement_report: a slice has more than "
                    f"{max_labels * max_labels} distinct label pairs - "
                    "is a free-text column being passed as a label? "
                    "Slice:"
                ),
                *(
                    [F.coalesce(F.col(by).cast("string"), F.lit("NULL"))]
                    if by
                    else [F.lit("(global)")]
                ),
            ),
        ).isNull()
    ).drop("__ncells")
    grouped = cells.groupBy(*keys).agg(
        F.sum("__c").alias("n"),
        F.sum(F.when(F.col("__la") == F.col("__lb"), F.col("__c"))).alias(
            "__agree"
        ),
        F.collect_list(F.struct("__la", "__lb", "__c")).alias("__cells"),
    )
    # marginals fold row-locally over the bounded cell list:
    # pe = Σ_label p_a(label) · p_b(label)
    pa = lambda label: F.aggregate(
        "__cells",
        F.lit(0.0),
        lambda acc, s: acc
        + F.when(s["__la"] == label, s["__c"]).otherwise(0.0),
    )
    pb = lambda label: F.aggregate(
        "__cells",
        F.lit(0.0),
        lambda acc, s: acc
        + F.when(s["__lb"] == label, s["__c"]).otherwise(0.0),
    )
    labels = F.array_distinct(
        F.concat(
            F.transform("__cells", lambda s: s["__la"]),
            F.transform("__cells", lambda s: s["__lb"]),
        )
    )
    pe = F.aggregate(
        labels,
        F.lit(0.0),
        lambda acc, label: acc
        + (pa(label) / F.col("n")) * (pb(label) / F.col("n")),
    )
    po = F.coalesce(F.col("__agree"), F.lit(0)) / F.col("n")
    out = grouped.select(
        *keys,
        "n",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.when(
            pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6)
        ).alias("kappa"),
    )
    return out


def distinct_ngram_report(
    docs: DataFrame,
    ns: tuple = (1, 2, 3),
    by: list[str] | None = None,
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """(…by, n, n_grams, n_distinct, distinct_ratio) — distinct-n
    diversity per corpus slice: the fraction of n-gram OCCURRENCES that
    are distinct types (Li et al. 2016's distinct-1/2; the standard
    mode-collapse read for synthetic/generated corpora, where
    perplexity-style quality scores stay flat while the generator
    repeats itself). A slice of identical documents scores near 0; a
    slice of fresh text stays high. ``distinct_ratio`` is rounded to
    6 dp; slices with no n-grams (every text shorter than n) report a
    0-gram row with NULL ratio rather than disappearing — "no
    evidence" and "no diversity" are different claims.

    Scale shape: per n, one explode + one (slice, gram)-keyed
    aggregation and one slice-keyed rollup — the exact-type count is a
    count-distinct, paid deliberately (diversity ratios are compared
    across slices and releases, so sketch error would eat the signal);
    results for all ``ns`` union into one report. No Python.
    ``exact=False`` is the 100 TB dial: ``approx_count_distinct`` at
    its documented ~2% rsd replaces the distinct expansion with an
    HLL partial-agg — use it for in-flight monitoring, keep ``exact``
    for anything a release decision reads."""
    keys = list(by or [])
    slices = (
        docs.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nd"))
        if keys
        else docs.agg(F.count(F.lit(1)).alias("__nd"))
    ).drop("__nd")
    out = None
    for n in ns:
        toks = F.filter(
            F.split(F.col(text_col), " "), lambda t: t != ""
        )
        pos = F.when(
            F.size("__toks") >= int(n),
            F.sequence(F.lit(1), F.size("__toks") - int(n) + 1),
        ).otherwise(F.array().cast("array<int>"))
        gram = F.concat_ws(
            " ",
            *[F.element_at("__toks", F.col("__i") + k) for k in range(int(n))],
        )
        g = (
            docs.select(*keys, toks.alias("__toks"))
            .select(*keys, "__toks", F.explode(pos).alias("__i"))
            .select(*keys, gram.alias("__gram"))
        )
        dcount = (
            F.count_distinct("__gram")
            if exact
            else F.approx_count_distinct("__gram")
        )
        agg = (
            g.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n_grams"),
                dcount.alias("n_distinct"),
            )
            if keys
            else g.agg(
                F.count(F.lit(1)).alias("n_grams"),
                dcount.alias("n_distinct"),
            )
        )
        # left join from the slice list keeps gramless slices visible
        row = (
            slices.join(agg, keys, "left") if keys else agg
        ).select(
            *keys,
            F.lit(int(n)).alias("n"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(F.col("n_distinct") / F.col("n_grams"), 6),
            ).alias("distinct_ratio"),
        )
        out = row if out is None else out.unionByName(row)
    return out
