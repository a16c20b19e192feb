"""PII detection and redaction as pure column expressions.

Regex-based scrubbing of the classic structured-PII classes (emails,
SSN-shaped ids, IPv4 addresses, phone-shaped digit runs).  Everything is
``regexp_replace`` / ``regexp_extract_all`` — JVM-side, whole-stage
codegen, zero Python — so it runs at scan speed over a 100 TB corpus and
a DuckDB oracle can compute the identical values (the patterns avoid
lookaround so Java regex and RE2 agree).

Detection is **sequential**: each class is counted on the text as
already redacted by the previous classes (email first, then SSN, then
IPv4, then phone), so an SSN is never double-counted as a phone number
and the counts always sum to the number of replacements made.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, replacement) — order matters: most specific first.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]", "[PHONE]"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Add ``out_col`` (the scrubbed text) plus one ``n_<class>`` count
    column per PII class and ``n_pii`` (their sum)."""
    cur: Column = F.col(text_col)
    counts: List[Column] = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pattern), 0))
                      .alias("n_%s" % name))
        cur = F.regexp_replace(cur, pattern, repl)
    return (df.select("*", *counts, cur.alias(out_col))
            .withColumn("n_pii", sum(F.col("n_%s" % name)
                                     for name, _, _ in PII_PATTERNS)))
