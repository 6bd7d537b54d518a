"""PII detection and redaction: regex scrubbing for training corpora.

Standard web-corpus preprocessing (e.g. the BigScience ROOTS / BigCode
StarCoder pipelines) strips personally identifiable information before
training.  This module implements the rule-based tier: emails, IPv4
addresses, US-SSN-shaped ids, and phone numbers, detected and replaced
with typed placeholder tokens.

Semantics — staged priority redaction: patterns apply in the fixed order
EMAIL → IPV4 → SSN → PHONE, each on the output of the previous stage, so
every character is claimed by at most one PII class (an SSN inside an
already-redacted email is not double-counted, and the SSN-shaped core of
a phone number is counted as SSN, not phone).  Counts are computed on the
same staged inputs, so ``n_<class>`` is exactly the number of
``<CLASS>`` tokens the corresponding stage inserted.

Patterns are written in the Java-regex ∩ RE2 common subset (no
backreferences, no lookaround, ASCII classes) so the DuckDB oracle can
run the byte-identical pattern — same contract as the portable md5 hash
family used by the dedup oracles.

Scale shape: pure narrow projections (chained ``regexp_replace`` /
``regexp_count`` in whole-stage codegen) — zero shuffles, embarrassingly
parallel, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# Ordered (class, pattern, placeholder). Order is semantic — see module doc.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # leading alternation instead of `\b\+?`: a word boundary never sits
    # between two non-word chars, so `\b\+` can never match "+1 555..."
    ("phone", r"(?:\+|\b)[0-9][0-9 -]{7,13}[0-9]\b", "<PHONE>"),
]


def _staged(text: Column) -> tuple[list[Column], list[Column]]:
    """(per-class counts, staged texts): counts[i] is measured on the text
    with classes 0..i-1 already redacted."""
    counts: list[Column] = []
    staged: list[Column] = [text]
    cur = text
    for _, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long"))
        cur = F.regexp_replace(cur, pat, token)
        staged.append(cur)
    return counts, staged


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_email/n_ipv4/n_ssn/n_phone`` + ``n_pii`` count columns."""
    counts, _ = _staged(F.coalesce(F.col(text_col), F.lit("")))
    out = df
    total = F.lit(0).cast("long")
    for (name, _, _), c in zip(PII_PATTERNS, counts):
        out = out.withColumn(f"n_{name}", c)
        total = total + c
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Add count columns plus ``out_col`` with every match replaced by its
    class placeholder, in priority order."""
    counts, staged = _staged(F.coalesce(F.col(text_col), F.lit("")))
    out = df
    total = F.lit(0).cast("long")
    for (name, _, _), c in zip(PII_PATTERNS, counts):
        out = out.withColumn(f"n_{name}", c)
        total = total + c
    return out.withColumn("n_pii", total).withColumn(out_col, staged[-1])
