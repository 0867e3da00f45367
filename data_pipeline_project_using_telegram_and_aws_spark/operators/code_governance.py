"""Code-corpus governance — license detection and credential
scrubbing over text columns, all JVM-side expressions (north-star
extension; the reference pipeline has no code surface — these are
the two gates every responsible CODE training corpus runs: keep only
redistributable licenses, and never train on leaked credentials).

License detection (:func:`detect_license`):

- ``SPDX-License-Identifier:`` header comments win when present —
  they are the author's own machine-readable statement (the REUSE
  convention), extracted verbatim including OR/AND/WITH expressions.
- Otherwise LICENSE-file text is classified by DISTINCTIVE-PHRASE
  fingerprints over normalized text (lowercase, whitespace
  collapsed): each supported license is identified by a phrase that
  appears in every faithful copy and in no other supported license
  (e.g. MIT's "permission is hereby granted, free of charge"; the
  BSD 3-clause is its 2-clause plus the no-endorsement clause, so
  3 is checked first). This is deliberately a high-precision
  CONTAINS match, not fuzzy similarity — a mangled license text
  classifies ``unknown`` and the document fails a keep-list gate,
  which is the safe failure direction for compliance.
- ``license_category`` buckets the result for policy filters:
  ``permissive | weak-copyleft | copyleft | public-domain |
  unknown``.

Credential scanning (:func:`scan_secrets`, :func:`redact_secrets`):
structured, high-precision token shapes only — prefixed vendor keys
(AWS ``AKIA``/``ASIA``, GitHub ``ghp_``-family, Slack ``xox``,
Google ``AIza``), PEM private-key blocks, and JWTs. Shapes with a
vendor-designed prefix have essentially zero false-positive rate,
which is what lets the scrub run unsupervised at corpus scale;
generic high-entropy-string detection is deliberately OUT of scope
here (entropy scoring is a Python-stage tradeoff and a recall
dial, not a precision one — stated, not hidden). The scrub replaces
each hit with ``[SECRET:<category>]`` and keeps per-category counts,
the `operators/redaction.py` audit pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "SECRET_PATTERNS",
    "LICENSE_FINGERPRINTS",
    "LICENSE_CATEGORIES",
    "scan_secrets",
    "redact_secrets",
    "detect_license",
]

# vendor-prefixed token shapes: precision by construction
SECRET_PATTERNS: dict[str, str] = {
    "aws_access_key": r"\b(?:AKIA|ASIA)[0-9A-Z]{16}\b",
    "github_token": r"\bgh[pousr]_[A-Za-z0-9]{36,255}\b",
    "slack_token": r"\bxox[baprs]-[A-Za-z0-9][A-Za-z0-9-]{9,}\b",
    "google_api_key": r"\bAIza[0-9A-Za-z_-]{35}\b",
    "private_key_block": (
        r"-----BEGIN [A-Z ]*PRIVATE KEY-----"
        r"[A-Za-z0-9+/=\s]+"
        r"-----END [A-Z ]*PRIVATE KEY-----"
    ),
    "jwt": (
        r"\beyJ[A-Za-z0-9_-]{8,}\.eyJ[A-Za-z0-9_-]{8,}"
        r"\.[A-Za-z0-9_-]{8,}\b"
    ),
}

# (license_id, distinctive phrase over normalized text); ORDER
# matters where one license's text contains another's phrase
# (BSD-3 before BSD-2, AGPL before GPL, LGPL before GPL)
LICENSE_FINGERPRINTS: list[tuple[str, str]] = [
    ("Apache-2.0", "apache license version 2.0"),
    ("MIT", "permission is hereby granted, free of charge"),
    ("AGPL-3.0", "gnu affero general public license"),
    ("LGPL-3.0", "gnu lesser general public license version 3"),
    ("LGPL-2.1", "gnu lesser general public license version 2.1"),
    ("GPL-3.0", "gnu general public license version 3"),
    ("GPL-2.0", "gnu general public license version 2"),
    ("MPL-2.0", "mozilla public license version 2.0"),
    # both wordings of clause 3 ("the copyright holder" / the named
    # organization) start this way; BSD-2 has no such clause
    ("BSD-3-Clause", "neither the name of"),
    ("BSD-2-Clause",
     "redistribution and use in source and binary forms"),
    ("ISC", "permission to use, copy, modify, and/or distribute"),
    ("Unlicense", "this is free and unencumbered software"),
    ("CC0-1.0", "cc0 1.0 universal"),
    ("CC-BY-4.0", "creative commons attribution 4.0"),
    ("CC-BY-SA-4.0", "creative commons attribution-sharealike 4.0"),
]

LICENSE_CATEGORIES: dict[str, str] = {
    "Apache-2.0": "permissive", "MIT": "permissive",
    "BSD-3-Clause": "permissive", "BSD-2-Clause": "permissive",
    "ISC": "permissive", "CC-BY-4.0": "permissive",
    "MPL-2.0": "weak-copyleft",
    "LGPL-3.0": "weak-copyleft", "LGPL-2.1": "weak-copyleft",
    "GPL-3.0": "copyleft", "GPL-2.0": "copyleft",
    "AGPL-3.0": "copyleft", "CC-BY-SA-4.0": "copyleft",
    "Unlicense": "public-domain", "CC0-1.0": "public-domain",
}

_SPDX_RE = (r"SPDX-License-Identifier:[ \t]*"
            r"([A-Za-z0-9.+-]+(?:[ \t]+(?:OR|AND|WITH)"
            r"[ \t]+[A-Za-z0-9.+-]+)*)")


def scan_secrets(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-category hit counts + ``has_secret`` — audit columns only,
    text untouched (run before :func:`redact_secrets` to quantify,
    or alone to gate)."""
    pats = SECRET_PATTERNS if patterns is None else patterns
    out = df
    total: Column = F.lit(0)
    for cat, pat in pats.items():
        cnt = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"n_{cat}", cnt)
        total = total + cnt
    return out.withColumn("has_secret", total > 0)


def redact_secrets(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every hit with ``[SECRET:<category>]`` (counts via
    :func:`scan_secrets` first, so the audit rides the same rows)."""
    pats = SECRET_PATTERNS if patterns is None else patterns
    out = scan_secrets(df, text_col, pats)
    scrubbed: Column = F.col(text_col)
    for cat, pat in pats.items():
        scrubbed = F.regexp_replace(
            scrubbed, F.lit(pat), F.lit(f"[SECRET:{cat}]")
        )
    return out.withColumn(out_col, scrubbed)


def detect_license(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Adds ``license_id`` / ``license_category`` / ``license_via``
    (``spdx-tag | fingerprint | none``) per the module contract."""
    spdx = F.regexp_extract(F.col(text_col), _SPDX_RE, 1)
    norm = F.regexp_replace(F.lower(F.col(text_col)),
                            F.lit(r"\s+"), F.lit(" "))
    fp: Column = F.lit(None).cast("string")
    for lic, phrase in reversed(LICENSE_FINGERPRINTS):
        fp = F.when(norm.contains(phrase.lower()), F.lit(lic)) \
            .otherwise(fp)
    license_id = F.when(spdx != "", spdx).otherwise(fp)
    cat_map = F.create_map(*[
        F.lit(x) for pair in LICENSE_CATEGORIES.items() for x in pair
    ])
    # SPDX expressions (OR/AND) don't map to one category; the simple
    # id lookup yields NULL there, which a policy gate must treat as
    # "review" — stated, not hidden
    category = F.coalesce(
        cat_map[license_id], F.lit("unknown")
    )
    via = F.when(spdx != "", F.lit("spdx-tag")) \
        .when(fp.isNotNull(), F.lit("fingerprint")) \
        .otherwise(F.lit("none"))
    return (
        df.withColumn("license_id", license_id)
        .withColumn(
            "license_category",
            F.when(license_id.isNull(), F.lit("unknown"))
            .otherwise(category),
        )
        .withColumn("license_via", via)
    )
