"""PII detection / redaction for training-data pipelines.

Standard web-corpus scrubbing (emails, phone numbers, IPv4 addresses)
as pure Column expressions — regexp_extract_all for counts and an
ordered regexp_replace chain for redaction, all JVM-side. Patterns are
deliberately kept inside the common subset of Java regex (Spark) and
RE2 (DuckDB oracle): character classes, bounded repetition, word
boundaries — no backreferences, no lookaround — so both engines
produce byte-identical redactions.

Engine addition beyond the reference (no PII handling there); the
public provenance for the op itself is any large-corpus pipeline
(e.g. the C4 blocklist/scrub stage, Raffel et al. 2020 §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: emails first (an email contains digits/dots that could
# otherwise partially match the phone/ip patterns), then ipv4, then
# phone — the redaction chain must apply in THIS order on both engines
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts. NB counts are measured on the ORIGINAL
    text independently per kind (an email's digits never double-count
    as a phone because the phone pattern requires 8+ chars of digits/
    separators, which the email pattern consumes in the redaction
    chain — counts here are diagnostic, redaction is authoritative)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        # long, not int: the DuckDB twin's len() is BIGINT and the
        # driver hash is Arrow-type-sensitive
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Ordered redaction chain — email -> ipv4 -> phone."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def sql_pii_exprs(col: str) -> tuple[dict[str, str], str]:
    """DuckDB twins: ({count_name: expr}, redacted_expr) built from the
    same PII_PATTERNS tuples so engine and oracle cannot drift."""
    counts = {
        f"n_{name}": f"len(regexp_extract_all({col}, '{pat}'))"
        for name, pat, _ in PII_PATTERNS
    }
    red = col
    for _, pat, tag in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    return counts, red
