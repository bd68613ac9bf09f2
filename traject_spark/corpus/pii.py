"""PII detection / redaction for training-data pipelines.

The standard pre-training scrub (emails, phone numbers, IP addresses —
the categories the public CCNet/Dolma/BigScience pipelines regex out)
as pure Column expressions: JVM-side `regexp_count`/`regexp_replace`,
zero UDF, zero shuffle — scan-speed at 100 TB like the rest of
``corpus.textstats``.

Pattern dialect: every pattern here is deliberately restricted to the
intersection of Java regex (Spark) and RE2 (DuckDB) — ASCII `\\d`/`\\s`
classes, `\\b` word boundaries, NO lookaround — so the DuckDB twin in
the tests runs the IDENTICAL pattern strings and the comparison is
meaningful. Precision/recall matches the public regex scrubs (i.e.
deliberately simple: catches the overwhelmingly common shapes, does not
attempt exotic RFC-grade addresses).

Redaction order is load-bearing and pinned: emails, then IPv4, then
phones — the loose phone pattern would otherwise eat dotted IPs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_stats_expr",
    "pii_redact_expr",
]

#: category -> (pattern, replacement token); insertion order IS the
#: redaction order (emails before IPv4 before phones)
PII_PATTERNS = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "ipv4": (
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "[IP]",
    ),
    # 8+ digit runs with separators, optional +country — after emails
    # and IPs are gone this cannot eat either. Explicit whitespace
    # class, not \s: Java's \s includes \x0B where RE2's does not, so
    # \s would break the cross-engine parity this module pins (same
    # discipline as _C4_TRAILING_WS in textstats.py; r15 advice fix)
    "phone": (
        r"\+?\d[\d \t\r\n\f().-]{7,}\d",
        "[PHONE]",
    ),
}


def pii_stats_expr(text: Column) -> Column:
    """struct(n_email, n_ipv4, n_phone, has_pii): occurrence counts per
    category over the RAW text (counts overlap-free per category; a
    string that is both an IP and phone-shaped counts under both — the
    stats are per-category detectors, the redactor is where order
    resolves precedence). NULL in -> NULL out."""
    counts = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    return F.when(
        text.isNotNull(),
        F.struct(
            counts["email"].alias("n_email"),
            counts["ipv4"].alias("n_ipv4"),
            counts["phone"].alias("n_phone"),
            (
                (counts["email"] > 0)
                | (counts["ipv4"] > 0)
                | (counts["phone"] > 0)
            ).alias("has_pii"),
        ),
    )


def pii_redact_expr(text: Column) -> Column:
    """The text with every PII match replaced by its category token
    (``[EMAIL]`` / ``[IP]`` / ``[PHONE]``), applied in the pinned
    order. NULL in -> NULL out."""
    out = text
    for _, (pat, token) in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token)
    return F.when(text.isNotNull(), out)
