"""PII redaction: scrub emails, phone numbers, IP addresses, and SSN-like
identifiers from a text column, keeping an auditable per-category count on
every row (the pre-training privacy scrub an LLM data pipeline runs after
curation and before packing).

Everything is JVM-side ``regexp_replace`` / ``regexp_count`` — no Python
in the path, so the scrub rides whole-stage codegen and scales like any
other projection. Patterns are deliberately conservative (high precision
over recall): a false positive silently deletes training signal, while a
false negative is caught by the downstream audit query on the counts.

Not registered as a driver correctness row: the synthetic ``documents``
corpus contains no emails/digits at all (verified — every category count
would be 0 and an oracle match would prove nothing about the regexes), so
the semantics are pinned by tests/test_redaction.py on fixture rows that
actually exercise every pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Patterns are mutually exclusive by construction (the phone shape's
# 3-3-4 digit grouping cannot match an SSN's 3-2-4 or a dotted IPv4), so
# neither count attribution nor replacement order is load-bearing. Each
# pattern is Java-regex (Spark) but kept to the RE2-safe subset (no
# backrefs, no lookaround) so an oracle twin stays possible.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+\d{1,2}[\s.-]?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def _token(category: str) -> str:
    return f"[{category.upper()}]"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append ``out_col`` (scrubbed text) plus one ``n_<category>`` count
    column per pattern. Counts are measured on the ORIGINAL text, before
    any replacement, so categories never steal each other's matches; the
    replacements then apply in declaration order."""
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    for cat, pat in pats.items():
        out = out.withColumn(
            f"n_{cat}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    scrubbed: Column = F.col(text_col)
    for cat, pat in pats.items():
        scrubbed = F.regexp_replace(scrubbed, pat, _token(cat))
    return out.withColumn(out_col, scrubbed)


def redaction_summary(redacted: DataFrame) -> DataFrame:
    """Corpus-level audit: total matches and affected-document count per
    category — the one-row-per-category table a privacy review signs off
    on. One aggregation job over the count columns (no rescan of text)."""
    cats = [c[2:] for c in redacted.columns if c.startswith("n_")]
    aggs = []
    for cat in cats:
        aggs.append(F.sum(f"n_{cat}").cast("long").alias(f"total_{cat}"))
        aggs.append(
            F.sum((F.col(f"n_{cat}") > 0).cast("long"))
            .cast("long")
            .alias(f"docs_{cat}")
        )
    return redacted.agg(*aggs)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    secret: str,
    length: int = 16,
    suffix: str = "_pseudo",
) -> DataFrame:
    """Replace identifier columns with keyed deterministic surrogates:
    ``sha2(secret || value)`` truncated to ``length`` hex chars — the
    privacy step for identifiers that must stay JOINABLE (user ids,
    session keys) where redaction's token replacement would destroy
    referential integrity. The same (secret, value) always maps to the
    same surrogate, across tables and runs, so joins and group-bys keep
    working on the pseudonymized columns; without the secret the mapping
    is not reversible by rainbow-tabling the (often tiny) id space.

    Appends ``<col><suffix>`` per input column and DROPS the original —
    the point is that the raw identifier leaves the dataset. NULLs stay
    NULL (absence is not an identity). Pure codegen projection: sha2 +
    substring, no shuffle, no Python.

    Surrogate collisions: 16 hex chars = 64 bits ⇒ birthday bound ~50%
    at ~5·10⁹ distinct values; raise ``length`` (up to 64) for id spaces
    beyond that."""
    if not cols:
        raise ValueError("pseudonymize: cols must name at least one column")
    if not secret:
        raise ValueError(
            "pseudonymize: an empty secret makes surrogates dictionary-"
            "attackable; pass a real key"
        )
    if not 8 <= length <= 64:
        raise ValueError("pseudonymize: length must be in [8, 64]")
    out = df
    for c in cols:
        surrogate = F.substring(
            F.sha2(
                F.concat(
                    F.lit(secret), F.lit("|"), F.col(c).cast("string")
                ).cast("binary"),
                256,
            ),
            1,
            length,
        )
        out = out.withColumn(
            c + suffix,
            F.when(F.col(c).isNull(), F.lit(None)).otherwise(surrogate),
        ).drop(c)
    return out
