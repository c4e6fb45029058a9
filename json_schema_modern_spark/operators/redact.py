"""PII detection / redaction over text columns.

The standard pre-training scrub pass: find emails, phone-ish numbers,
IPv4s, and long digit runs (card/account numbers) and replace them with
typed placeholder tokens.  Pure Column regex expressions — JVM-side,
codegen'd, no Python in the row loop — and the patterns are deliberately
RE2-compatible (no backrefs/lookaround) so a SQL oracle replays them.

This is detection-grade, not compliance-grade: the patterns catch the
high-volume formats a web corpus actually contains; a production scrub
adds locale-specific validators downstream of the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern registry: name -> (regex, placeholder).  Order matters: longer /
# more specific patterns run first so their text is consumed before the
# generic digit-run pass.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[ .\-]?\(?\d{2,4}\)?[ .\-]?\d{3,4}[ .\-]?\d{3,4}\b",
     "<PHONE>"),
    ("digits", r"\b\d{9,}\b", "<NUMBER>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """name -> count of matches in `text` (count BEFORE redaction, each
    pattern over the original text)."""
    return {name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
            for name, pat, _ in PII_PATTERNS}


def redact(text: Column) -> Column:
    """Apply every pattern in registry order, replacing matches with the
    typed placeholder."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, n_digits, n_pii[, redacted]) per doc —
    count columns follow PII_PATTERNS registry order.

    keep_text=True additionally materializes the redacted text — off by
    default so the stats-only pass never carries the text through the agg.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    cols = [F.col(id_col)]
    cols += [counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS]
    total = None
    for name, _, _ in PII_PATTERNS:
        total = counts[name] if total is None else total + counts[name]
    cols.append(total.alias("n_pii"))
    if keep_text:
        cols.append(redact(t).alias("redacted"))
    return df.select(*cols)
