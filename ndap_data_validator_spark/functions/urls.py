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
# full authority (may contain user:pass@ and :port); host extraction strips
# both below — capturing [^/:?#]+ here would truncate 'u:p@host' at the ':'
_AUTHORITY_FROM_URL = r"^https?://([^/?#]+).*$"


def extract_urls(col: Column) -> Column:
    """All URL spans in the text (array<string>; [] when none)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), F.lit(0))


def extract_domains(col: Column) -> Column:
    """Distinct lowercased HOSTS of every URL in the text. Userinfo and
    port are stripped (``http://u:p@evil.com:8080`` yields ``evil.com``,
    not ``u``/``u:p@evil.com``) — host = authority after the last ``@``,
    then either the bracketed ``[...]`` IPv6 literal taken whole (ADVICE
    r04: the colon port-strip used to mangle ``http://[::1]:8080/x`` into
    host ``[``) or everything before the first ``:``. So credentials
    can't smuggle a blocked domain past the gate, and IPv6-hosted entries
    match blocklist literals like ``[::1]``."""

    def _host(u: Column) -> Column:
        auth = F.lower(F.regexp_replace(u, _AUTHORITY_FROM_URL, "$1"))
        no_user = F.element_at(F.split(auth, "@"), -1)
        bracketed = F.regexp_extract(no_user, r"^(\[[^\]]*\])", 1)
        return F.when(no_user.startswith("["), bracketed).otherwise(
            F.element_at(F.split(no_user, ":"), 1)
        )

    return F.array_distinct(F.transform(extract_urls(col), _host))


def _host_blocked(host: Column, blocklist: list[str]) -> Column:
    """Label-suffix match: host is blocked when it equals a blocked domain
    or is any subdomain of one (``a.evil.com`` matches ``evil.com``).
    Substring tricks (`contains`/`endswith` without the dot) would
    over-match ``notevil.com`` — the dot-anchored suffix is the correct
    registrable-domain rule."""
    cond = F.lit(False)
    for d in blocklist:
        dl = d.lower()
        cond = cond | (host == dl) | host.endswith("." + dl)
    return cond


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    keep: bool = True,
) -> DataFrame:
    """Drop (or with ``keep=False`` select) documents referencing any
    blocked domain or a subdomain of one. The blocklist folds into the plan
    as literal comparisons — the whole gate is one scan-level filter."""
    hit = F.exists(
        extract_domains(F.col(text_col)), lambda h: _host_blocked(h, blocklist)
    )
    return df.where(~hit if keep else hit)
