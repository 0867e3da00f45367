"""Deterministic dataset splits: assign every row a stable train/val/test
(or arbitrary weighted) split from a hash of its id — the reproducible
alternative to `randomSplit`, whose assignment depends on partitioning
and reshuffles between runs.

Why not ``randomSplit``: it samples per-partition with a seeded RNG, so
the same row can land in different splits after a repartition, a scale-up,
or an engine upgrade — poison for train/eval hygiene. Hashing the id
makes the split a pure function of the data: stable across runs, engines,
partition layouts, and incremental arrivals (a new document's split is
decided the moment it gets an id, without reshuffling old ones).

Scale: one codegen'd projection, no shuffle, no state. The md5-prefix
fraction is uniform to ~2^-24 over the 6-hex-digit space, plenty below
any split-ratio tolerance that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPACE = float(16**6)  # 6 hex digits → uniform fraction in [0, 1)


def hash_fraction(id_col: str | Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction from md5(salt || id) — the split die roll.
    ``salt`` yields independent splits from the same ids (e.g. a second
    held-out set that must not correlate with the first)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hex6 = F.substring(
        F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 6
    )
    return F.conv(hex6, 16, 10).cast("long") / F.lit(_SPACE)


def assign_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Append ``out_col`` labeling each row with a split name, with
    expected proportions ``weights`` (normalized internally). Assignment
    is the cumulative-interval lookup on the hash fraction, so a row's
    split never changes unless its id or the salt does — and narrowing a
    leading split keeps the survivors a subset of the original split.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    frac = hash_fraction(id_col, salt)
    expr: Column | None = None
    cumulative = 0.0
    names = list(weights)
    for name in names[:-1]:
        cumulative += weights[name] / total
        clause = frac < cumulative
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def weighted_mixture(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-source mixture sampling — the data-recipe
    operator: ``rates[source] = 0.25`` keeps a quarter of that source,
    ``2.5`` repeats every row twice and keeps half a third time (the
    oversampling convention pretraining mixtures use, tracked in an
    ``epoch`` column so the dataloader can interleave repeats).

    Mechanics: integer part → ``explode(sequence(0, n-1))`` repeats;
    fractional part → hash-fraction acceptance salted per (salt, epoch),
    so the partial epoch is an unbiased, stable subset and narrowing a
    rate keeps survivors a subset of the wider rate's. Pure projection +
    one explode — no shuffle, no RNG, rerun-identical (the property
    ``sample()`` lacks), safe to compose before :func:`assign_split` and
    packing."""
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("mixture rates must be >= 0")
    rate = F.lit(float(default_rate))
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, float(r)).otherwise(rate)
    out = df.withColumn("__rate", rate)
    # epochs 0..ceil(rate)-1; the last epoch keeps the fractional share
    n_epochs = F.ceil("__rate").cast("int")
    out = out.withColumn(
        "epoch",
        F.explode(F.sequence(F.lit(0), F.greatest(n_epochs, F.lit(1)) - 1)),
    )
    frac_of_epoch = F.least(F.col("__rate") - F.col("epoch"), F.lit(1.0))
    die = hash_fraction(
        F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("epoch")),
        salt,
    )
    return out.filter(die < frac_of_epoch).drop("__rate")


def split_report(df: DataFrame, out_col: str = "split") -> DataFrame:
    """Observability: row count and fraction per split (one aggregation;
    the fraction is computed in-plan from a window total, no driver-side
    count)."""
    from pyspark.sql import Window

    counts = df.groupBy(out_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = F.sum("n_rows").over(Window.partitionBy())
    return counts.select(
        out_col,
        "n_rows",
        F.round(F.col("n_rows") / total, 4).alias("fraction"),
    ).orderBy(out_col)


def deterministic_take_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``n`` rows per group (fewer when the group is smaller) —
    the fixed-count complement of :func:`weighted_mixture`'s rates, used
    for eval-set and few-shot-pool construction where "about 2%" is not
    a contract but "exactly 500 per source" is. Selection is the md5
    order of (salt, id): add rows to a group and the previously-selected
    subset only ever changes where new ids hash earlier — no reshuffle
    of the whole sample on every corpus append (the rank is stable in
    distribution, unlike timestamp- or ingestion-order heads).

    One shuffle, keyed by the group; the window ranks md5(salt|id) and
    keeps ranks ≤ n. Skewed groups cost their own size in rank work,
    nothing corpus-wide."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def temperature_sample(
    df: DataFrame,
    score_col: str,
    tau: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "temperature",
    max_score: float | None = None,
) -> DataFrame:
    """Quality-weighted sampling: keep each row with probability
    ``(score / max_score) ** tau`` — the soft alternative to a hard
    classifier threshold (keep-probability rises smoothly with quality,
    so borderline documents are downweighted rather than cliffed, the
    way quality-classifier corpora are actually sampled at scale).

    ``tau`` is the sharpness dial: 0 keeps everything (weights flatten
    to 1), 1 samples proportional to score, large tau approaches the
    hard top-score filter. Scores must be non-negative; rows with NULL
    score are dropped (they have no evidence of quality — filter first
    if they should survive).

    ``max_score``: the normalizer. Pass it when the score has a known
    scale (e.g. a classifier probability → 1.0 — making the plan a pure
    projection); None derives the corpus max in-plan via a scalar
    aggregation that broadcasts back as a literal-sized cross join, the
    same one-row-constants shape ``retrieval._corpus_constants`` uses.

    Acceptance reuses :func:`hash_fraction` on (salt, id): rerun- and
    layout-stable, and monotone in tau — raising tau only ever drops
    MORE rows (survivors at tau₂ > tau₁ are a subset of tau₁'s, pinned
    in tests), so tightening a recipe never resurrects documents."""
    if tau < 0:
        raise ValueError("temperature_sample: tau must be >= 0")
    d = df.filter(F.col(score_col).isNotNull())
    if max_score is not None:
        norm = F.lit(float(max_score))
        d = d.withColumn("__mx", norm)
    else:
        mx = d.agg(F.max(F.col(score_col)).alias("__mx"))
        d = d.crossJoin(F.broadcast(mx))
    keep_p = F.pow(
        F.least(F.col(score_col) / F.col("__mx"), F.lit(1.0)), F.lit(tau)
    )
    die = hash_fraction(id_col, salt)
    return d.filter(die < keep_p).drop("__mx")


def take_tokens_per_group(
    df: DataFrame,
    group_col: str,
    token_budget: int,
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    salt: str = "token-budget",
) -> DataFrame:
    """At most ``token_budget`` tokens per group — the BATCH twin of the
    streaming per-source quota (`streaming/quota.py`), for recipes
    specified as absolute token masses ("at most 10 M tokens of src1")
    rather than rates or document counts.

    Semantics: the longest md5(salt|id)-ordered prefix of each group
    whose cumulative token count fits the budget. This differs from the
    streaming gate at the boundary by design: the stream admits in
    arrival order and skips individually-oversized documents (arrival
    order IS its semantic); the batch rule cuts once at the first
    crossing, which keeps the result a pure function of (data, salt) —
    rerun- and layout-stable, and monotone in the budget (a bigger
    budget only ever ADDS documents, pinned in tests).

    One shuffle keyed by the group; the running sum is a per-group
    window — skewed groups cost their own size, nothing corpus-wide.
    Zero-token documents inside the prefix are admitted even at budget
    0 (they cost nothing)."""
    if token_budget < 0:
        raise ValueError("take_tokens_per_group: token_budget must be >= 0")
    from .packing import default_token_count

    from pyspark.sql import Window

    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else default_token_count(text_col)
    )
    d = df.withColumn("__nt", n_tok.cast("long"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(
            F.md5(
                F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
            ),
            F.col(id_col),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("__cum", F.sum("__nt").over(w))
        .filter(F.col("__cum") <= token_budget)
        .drop("__cum", "__nt")
    )


def weighted_take_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "weighted-take",
) -> DataFrame:
    """EXACTLY ``n`` rows per group, sampled without replacement with
    probability proportional to ``weight_col`` — the principled
    weighted counterpart of :func:`deterministic_take_per_group`
    (which is the uniform case), via the Efraimidis-Spirakis exponential
    sort: rank on ``-ln(u) / w`` with ``u`` the stable hash die, keep
    the ``n`` smallest per group. With hash-stable ``u`` the whole
    sample is a pure function of (data, salt): rerun- and layout-stable,
    and append-stable in the same sense as the uniform taker (a new row
    displaces at most one old one).

    Rows with NULL, zero, or negative weight are excluded (they have no
    sampling mass; zero-weight rows surviving "proportional" sampling
    would be a contradiction). One group-keyed window, nothing else."""
    if n <= 0:
        raise ValueError("weighted_take_per_group: n must be > 0")
    from pyspark.sql import Window

    d = df.filter(F.col(weight_col) > 0)
    u = hash_fraction(id_col, salt)
    # u in [0,1): flip to (0,1] so ln() is defined at every row
    key = -F.log(F.lit(1.0) - u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def quantile_gate(
    df: DataFrame,
    score_col: str,
    q_lo: float = 0.0,
    q_hi: float = 1.0,
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep rows whose ``score_col`` lies between the corpus's q_lo and
    q_hi quantiles — the "drop the bottom 10% by LM score" recipe step,
    with the thresholds derived from the data itself rather than a
    hand-tuned constant that silently ages as the corpus shifts.

    Thresholds come from ``approx_percentile`` (one aggregation,
    Greenwald-Khanna sketch — ``relative_error`` is its documented
    rank-accuracy dial) and join back as a broadcast 1-row literal, so
    the gate is threshold-derivation + one codegen'd filter; NULL
    scores drop (no evidence, same stance as temperature_sample).
    Unlike a hash die, the SAME row can flip across corpus versions if
    the distribution moves — that's the point (relative standards),
    and the reason this is not the tool for stable splits."""
    if not 0.0 <= q_lo < q_hi <= 1.0:
        raise ValueError("quantile_gate: need 0 <= q_lo < q_hi <= 1")
    bounds = df.agg(
        F.percentile_approx(
            score_col, [float(q_lo), float(q_hi)], int(1 / relative_error)
        ).alias("b")
    ).select(
        F.col("b")[0].alias("__lo"), F.col("b")[1].alias("__hi")
    )
    return (
        df.filter(F.col(score_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .filter(F.col(score_col).between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
    )


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """:func:`assign_split`, but hashed on a GROUP id instead of the
    row id — every member of a group lands in the SAME split. The
    eval-hygiene fix for corpora with known near-duplicate structure:
    splitting near-dups by doc id puts one copy in train and its twin
    in holdout, and the holdout silently measures memorization of the
    training copy. Feed it the duplicate-group labels the dedup stack
    already computes (`semantic_dedup`'s ``dup_group``,
    `connected_components`' ``component``, `curation`'s closure) and
    the leak is structural, not probabilistic.

    Same cost as assign_split (a projection) once the group column
    exists; the group computation itself is the dedup pass you were
    already running."""
    return assign_split(
        df, weights, id_col=group_col, out_col=out_col, salt=salt
    )


def solve_mixture(
    availability: dict[str, float],
    targets: dict[str, float],
    max_epochs: float = 4.0,
) -> dict:
    """Recipe design arithmetic: given each source's available token
    mass and the TARGET mixture fractions, compute the largest total
    corpus achievable without oversampling any source beyond
    ``max_epochs``, and the per-source rates that realize it — the
    numbers :func:`weighted_mixture` consumes.

    The binding source is the one with the least mass relative to its
    target: ``T* = min_s(tokens_s · max_epochs / f_s)``; rates are
    ``f_s · T* / tokens_s`` (≤ max_epochs by construction, the binding
    source exactly AT max_epochs). Driver-side arithmetic over a
    source-count-sized dict — feed it one aggregation's output."""
    if not targets or any(v <= 0 for v in targets.values()):
        raise ValueError("solve_mixture: targets must be positive")
    missing = set(targets) - set(availability)
    if missing:
        raise ValueError(
            f"solve_mixture: no availability for {sorted(missing)}"
        )
    if max_epochs <= 0:
        raise ValueError("solve_mixture: max_epochs must be > 0")
    total_f = float(sum(targets.values()))
    f = {s: v / total_f for s, v in targets.items()}
    t_star, binding = min(
        ((availability[s] * max_epochs / f[s], s) for s in f),
        key=lambda x: x[0],
    )
    rates = {
        s: round(f[s] * t_star / availability[s], 9) for s in f
    }
    return {
        "total_tokens": t_star,
        "binding_source": binding,
        "rates": rates,
        "epochs": {
            s: round(rates[s], 4) for s in f
        },
    }


def normalize_scores_per_group(
    df: DataFrame,
    score_col: str,
    by: list[str],
    method: str = "robust",
    out_col: str | None = None,
) -> DataFrame:
    """Normalize a score WITHIN each group so thresholds compare across
    groups — the cross-source comparability step before any global
    gate: a quality classifier calibrated on web text scores academic
    PDFs on a different scale, and a single global cutoff then filters
    by SOURCE, not by quality. Normalizing per source first makes
    `quantile_gate`/`temperature_sample` cuts mean the same thing in
    every slice.

    ``method="zscore"``: (x − mean)/stddev; ``"robust"`` (default):
    (x − median)/(1.4826·MAD) — the `profiling.robust_outlier_report`
    scaling, poison-proof against the heavy tails quality scores
    actually have. Degenerate groups (zero spread, or robust MAD = 0)
    normalize to 0.0 rather than NULL/±inf — every row keeps a usable
    score. NULL scores pass through as NULL.

    Plan: one partial-agg'd group-stats aggregation (groups-sized
    output, broadcast back) + a row-local projection — the corpus
    shuffles zero times."""
    if method not in ("zscore", "robust"):
        raise ValueError(
            "normalize_scores_per_group: method must be zscore | robust"
        )
    x = F.col(score_col)
    if method == "zscore":
        stats = df.groupBy(*by).agg(
            F.avg(x).alias("__center"),
            F.stddev_pop(x).alias("__scale"),
        )
    else:
        stats = df.groupBy(*by).agg(
            F.expr(f"percentile({score_col}, 0.5)").alias("__center"),
        )
        mad = df.join(F.broadcast(stats), by).groupBy(*by).agg(
            F.expr(
                f"percentile(abs({score_col} - __center), 0.5)"
            ).alias("__mad"),
            F.first("__center").alias("__center"),
        )
        stats = mad.select(
            *by, "__center", (F.col("__mad") * 1.4826).alias("__scale")
        )
    out = out_col or f"{score_col}_norm"
    return (
        df.join(F.broadcast(stats), by)
        .withColumn(
            out,
            F.when(x.isNull(), F.lit(None).cast("double"))
            .when(
                F.coalesce(F.col("__scale"), F.lit(0.0)) <= 0.0,
                F.lit(0.0),
            )
            .otherwise((x - F.col("__center")) / F.col("__scale")),
        )
        .drop("__center", "__scale")
    )
