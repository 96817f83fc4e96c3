"""URL / domain signals for corpus filtering: extract URLs and their
domains from text, and gate documents against a domain blocklist — the
standard pre-training source-hygiene pass (north-star addition; the
reference validates tabular files only).

Same design rules as functions/pii.py: patterns live in the Java-regex ∩
RE2 subset so an external engine replays extraction byte-for-byte, and
everything is pure Catalyst regex — whole-stage codegen, zero Python.

Scale shape: extraction is a projection (no shuffle); the blocklist gate is
``arrays_overlap`` against a LITERAL array for catalog-sized lists (stays a
scan-level filter), or an explode + broadcast anti-join when the blocklist
is a table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_PATTERN = r"https?://[A-Za-z0-9._~:/?#\[\]@!$&'()*+,;=%-]+"
_DOMAIN_FROM_URL = r"^https?://([^/:?#]+).*$"


def extract_urls(col: Column) -> Column:
    """All URL spans in the text (array<string>; [] when none)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), F.lit(0))


def extract_domains(col: Column) -> Column:
    """Distinct lowercased domains of every URL in the text."""
    return F.array_distinct(
        F.transform(
            extract_urls(col),
            lambda u: F.lower(F.regexp_replace(u, _DOMAIN_FROM_URL, "$1")),
        )
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    keep: bool = True,
) -> DataFrame:
    """Drop (or with ``keep=False`` select) documents referencing any
    blocked domain. The blocklist folds into the plan as a literal array —
    the whole gate is one scan-level filter."""
    blocked = F.array(*[F.lit(d.lower()) for d in blocklist])
    hit = F.arrays_overlap(extract_domains(F.col(text_col)), blocked)
    return df.where(~hit if keep else hit)
