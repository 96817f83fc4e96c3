"""PII detection + redaction for training-data pipelines (north-star text
op; no counterpart in the reference). The standard pre-training scrub
(emails / IPs / phone-ish numbers, as in C4/Dolma-style cleanups) expressed
as pure Catalyst regex — whole-stage codegen, zero Python.

Pattern dialect: the common Java-regex ∩ RE2 subset (no backreferences, no
lookaround), so an external engine (DuckDB/RE2) replays detection and
redaction byte-for-byte for verification.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: redaction applies in this order (email before phone so the
# digits inside an email never match the phone pattern first)
#
# phone: 7-15 digits total (ITU E.164 bounds), each separated by at most two
# of [ tab ( ) . -] — never \s, so a match cannot span newlines, and never
# unbounded, so a long ID/hash digit run is not swallowed whole (ADVICE r02:
# the old `[0-9()\s.-]{7,}` matched any ≥9-char digit-ish run incl.
# timestamps across lines). KNOWN FALSE-POSITIVE CLASSES that remain, by
# design (recall-biased scrubbing, standard for pre-training cleanups):
# dates ("2026-08-16" is 8 digits in phone-shaped groups), and the first 15
# digits of a ≥16-digit run. A precision-critical deployment would add a
# date-shape pre-pass; kept single-pattern here for engine-replayability.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9](?:[ \t().-]{0,2}[0-9]){6,14}"),
]

REDACTED = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_count(col: Column, kind: str) -> Column:
    pattern = dict(PII_PATTERNS)[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its typed token, in PII_PATTERNS order."""
    out = col
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, REDACTED[kind])
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    """DuckDB rendering of pii_count (RE2; same pattern string)."""
    pattern = dict(PII_PATTERNS)[kind].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def redact_pii_sql(expr: str) -> str:
    out = expr
    for kind, pattern in PII_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{REDACTED[kind]}', 'g')"
    return out
