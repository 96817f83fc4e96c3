"""Rule catalog + role model.

Mirrors the reference's rule vocabulary —
``/root/reference/utils/validation_rules.json`` (per-schema × per-role flags
``notNull / mandatory / numericOnly``) and the role model of
``/root/reference/utils/validation.py:137-144`` (``ROLE_OPTIONS``,
``MEASURE_TYPES``) — and extends it with the engine-level rules the north
star requires: range, regex-domain, uniqueness keys, referential integrity,
and drift checks. The catalog is plain data; compilation to Catalyst
expressions lives in ``functions/`` and ``operators/``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from importlib import resources
from typing import Any

ROLE_OPTIONS = ["Location", "Time", "Measures", "Others"]
MEASURE_TYPES = ["integer", "float"]

# Physical types the coercion layer supports
# (reference DATATYPE_OPTIONS, utils/validation.py:11-19).
DATATYPE_OPTIONS = [
    "string",
    "integer",
    "float",
    "boolean",
    "date",
    "datetime",
    "category",
]

# Exact reason strings — part of the report contract
# (utils/validation.py:289, 292, 320, 327; note trailing space in the
# time-format message and the absent 6th pattern, both reproduced verbatim).
REASON_NON_NUMERIC = "Non-numeric values detected"
REASON_NO_NULLS = "No Nulls allowed"
REASON_INVALID_TIME = (
    "Invalid time format; allowed: 'YYYY', 'YYYY-YY', 'MMM-YYYY', "
    "'MMM-MMM, YYYY', 'MMM - MMM, YYYY' "
)
REASON_INCONSISTENT_TIME = "Inconsistent time formats across rows"

# Roles hard-required regardless of catalog flags
# (utils/validation.py:345-348).
HARD_REQUIRED_ROLES = ("Time", "Measures")


@dataclass(frozen=True)
class RoleRule:
    not_null: bool = False
    mandatory: bool = False
    numeric_only: bool = False


@dataclass(frozen=True)
class ColumnAssignment:
    """One column's role binding — the logical-schema layer the reference
    collects from ``role_{col}`` / ``measure_type_{col}`` form fields
    (main.py:846-851).

    Engine extensions (all optional, default off):
      * ``min_value``/``max_value`` — inclusive range rule on the coerced value
      * ``regex`` — value-domain rule (full-match) on the string form
      * ``time_date_only`` — datetime → date truncation (validation.py:84)
      * ``tolerance`` — max allowed violation FRACTION per rule before the
        column fails (Deequ/Great-Expectations-standard knob). None (the
        default) keeps the reference's strict any-violation-fails verdict;
        ``0.001`` means "pass while ≤0.1% of the partition's rows violate".
        At 10^12 turns a handful of bad rows in a trillion must be allowed
        to pass without editing data. Applies to every count-based rule on
        the column (nulls, conversion errors, invalid time, range, regex,
        domain); the time format-CONSISTENCY rule reads it as "minority
        formats ≤ fraction". Violation ROWS and COUNTS are unaffected —
        tolerance only moves the pass/fail verdict.
      * ``severity`` — ``"error"`` (default: a tripped rule fails the
        column, hence the partition and any publish gate) or ``"warn"``
        (the tripped rule's reason strings still appear in ``reasons`` and
        its rows in the violation report, but ``passed`` stays True so the
        partition verdict and downstream gates never see it).
    """

    column: str
    role: str = "Others"
    measure_type: str | None = None  # integer | float (Measures only)
    min_value: float | None = None
    max_value: float | None = None
    regex: str | None = None
    time_date_only: bool = False
    # small-domain rule: non-null values must be in this set. This is the
    # broadcast form of referential integrity — the allowed set rides into
    # the shared scan as an isin literal (no join, no extra pass). For big
    # dimensions use operators/referential.py instead.
    allowed_values: tuple[str, ...] | None = None
    tolerance: float | None = None
    severity: str = "error"

    def __post_init__(self) -> None:
        if self.role not in ROLE_OPTIONS:
            raise ValueError(f"unknown role {self.role!r}; one of {ROLE_OPTIONS}")
        if self.measure_type is not None and self.measure_type not in MEASURE_TYPES:
            raise ValueError(
                f"unknown measure_type {self.measure_type!r}; one of {MEASURE_TYPES}"
            )
        if self.tolerance is not None and not (0.0 <= self.tolerance <= 1.0):
            raise ValueError(
                f"tolerance must be a fraction in [0, 1], got {self.tolerance!r}"
            )
        if self.severity not in ("error", "warn"):
            raise ValueError(
                f"severity must be 'error' or 'warn', got {self.severity!r}"
            )


@dataclass(frozen=True)
class UniquenessRule:
    """Composite-key uniqueness, e.g. (conv_id, turn_idx)."""

    key_columns: tuple[str, ...]


@dataclass(frozen=True)
class SequenceRule:
    """Conversation-order sequence rules over a (key, order) window — the
    transcript-payload checks beyond per-row rules: turn contiguity
    (``expected_step``), event-time monotonicity (``ts_column``), speaker
    alternation (``role_column``), and maximum silence (``max_gap_sec``).
    Compiled by ``operators/convchecks.sequence_checks`` into ONE window
    shuffle on ``key_column``."""

    key_column: str
    order_column: str
    ts_column: str | None = None
    role_column: str | None = None
    expected_step: int | None = None
    max_gap_sec: float | None = None
    # role-transition FSM whitelist (needs role_column): a turn violates
    # ('bad_transition') when the previous turn exists and
    # (prev_role, role) is not in this set — the "a tool turn must follow
    # an assistant turn" class of rule. frozenset so the rule stays
    # hashable (the dataclass is frozen and digested into the checkpoint).
    allowed_transitions: frozenset[tuple[str, str]] | None = None


@dataclass(frozen=True)
class CheckRule:
    """Generic row-level CHECK constraint — a named SQL boolean expression
    over any columns of the frame (the cross-column class the per-column
    rules can't express: "a tool turn must name a tool", "end >= start").
    Standard-SQL CHECK semantics: a row violates only when the expression
    is definitively FALSE; NULL (unknown) passes, so nullability stays the
    notNull rule's job. Compiled by ``operators/checks.py`` into one
    scan-level projection (violations) or one aggregate (summary) — never
    a shuffle. Engine scope: the reference's rules are per-column
    (utils/validation.py); symmetric with SequenceRule."""

    name: str
    expression: str

    def __post_init__(self) -> None:
        if not self.name or not self.expression:
            raise ValueError("CheckRule needs a name and a SQL expression")


@dataclass(frozen=True)
class ReferentialRule:
    """Referential integrity: every non-null ``column`` value must exist in
    ``ref_table_name.ref_column`` (violations = left-anti join)."""

    column: str
    ref_table_name: str
    ref_column: str


@dataclass
class RuleCatalog:
    """Parsed catalog: per-schema role rules + default schema name."""

    default_schema: str
    schemas: dict[str, dict[str, RoleRule]]
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "RuleCatalog":
        schemas: dict[str, dict[str, RoleRule]] = {}
        for schema_name, roles in (data.get("schemas") or {}).items():
            schemas[schema_name] = {
                role: RoleRule(
                    not_null=bool(flags.get("notNull", False)),
                    mandatory=bool(flags.get("mandatory", False)),
                    numeric_only=bool(flags.get("numericOnly", False)),
                )
                for role, flags in roles.items()
                if isinstance(flags, dict)
            }
        return cls(
            default_schema=data.get("defaultSchema") or "National",
            schemas=schemas,
            raw=data,
        )

    @classmethod
    def from_json(cls, text: str) -> "RuleCatalog":
        return cls.from_dict(json.loads(text))

    def schema_rules(self, schema_name: str | None = None) -> dict[str, RoleRule]:
        key = schema_name or self.default_schema
        return self.schemas.get(key, {})

    def mandatory_roles(self, schema_name: str | None = None) -> list[str]:
        """Catalog-mandatory roles plus the hard-required Time/Measures
        (utils/validation.py:344-348) — order preserved as the reference
        builds it (catalog order, then appended hard-required)."""
        rules = self.schema_rules(schema_name)
        mandatory = [r for r, flags in rules.items() if flags.mandatory]
        for hard in HARD_REQUIRED_ROLES:
            if hard not in mandatory:
                mandatory.append(hard)
        return mandatory

    def digest(self) -> str:
        """Stable digest of the catalog for checkpoint lineage: a re-run with
        a changed catalog must not skip 'done' partitions."""
        canonical = json.dumps(self.raw, sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


def load_default_catalog() -> RuleCatalog:
    text = (
        resources.files("ndap_data_validator_spark.rules")
        .joinpath("catalog.json")
        .read_text(encoding="utf-8")
    )
    return RuleCatalog.from_json(text)


def assignment_digest(
    assignments: list[ColumnAssignment],
    catalog: RuleCatalog,
    schema_name: str | None = None,
) -> str:
    """Digest of (catalog, schema, role assignment) — the full rule identity
    a checkpoint row records."""
    def _one(a: ColumnAssignment) -> dict[str, Any]:
        d: dict[str, Any] = {
            "column": a.column,
            "role": a.role,
            "measure_type": a.measure_type,
            "min": a.min_value,
            "max": a.max_value,
            "regex": a.regex,
            "date_only": a.time_date_only,
            "allowed": list(a.allowed_values) if a.allowed_values else None,
        }
        # identity property (same contract as run_rule_digest): the
        # tolerance/severity keys enter the digest ONLY when set, so every
        # checkpoint written before these knobs existed stays valid for
        # default-strict assignments — and a run that changes a tolerance
        # correctly invalidates its partitions.
        if a.tolerance is not None:
            d["tolerance"] = a.tolerance
        if a.severity != "error":
            d["severity"] = a.severity
        return d

    payload = {
        "catalog": catalog.digest(),
        "schema": schema_name or catalog.default_schema,
        "assignments": [
            _one(a) for a in sorted(assignments, key=lambda a: a.column)
        ],
    }
    canonical = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()


def run_rule_digest(
    base_digest: str,
    sequence_rule: SequenceRule | None = None,
    check_rules: list[CheckRule] | None = None,
    metric_rules: list | None = None,
    drift_rule=None,
) -> str:
    """The FULL rule identity of a checkpointed run: the per-column
    assignment digest composed with the run's SequenceRule, CheckRules,
    and dataset-level MetricRules (operators/expectations.py). Without
    these, a re-run whose sequence/CHECK/metric rules changed would still
    skip 'done' partitions and leave a report mixing rule versions — the
    exact staleness the rule digest exists to prevent.

    Identity property: with no sequence/CHECK/metric rules the base digest
    is returned UNCHANGED, so checkpoints written before (or without)
    these rule families stay valid for the classic per-column path. The
    ``metrics`` key likewise enters the payload only when metric rules are
    present, so seq/CHECK-only digests from earlier versions are stable.
    Same for ``drift`` (operators/drift.DriftRule): re-baselining or moving
    a threshold re-keys the run, older digests stay byte-identical."""
    if (
        sequence_rule is None
        and not check_rules
        and not metric_rules
        and drift_rule is None
    ):
        return base_digest
    payload = {
        "base": base_digest,
        "sequence": None
        if sequence_rule is None
        else {
            "key": sequence_rule.key_column,
            "order": sequence_rule.order_column,
            "ts": sequence_rule.ts_column,
            "role": sequence_rule.role_column,
            "step": sequence_rule.expected_step,
            "max_gap": sequence_rule.max_gap_sec,
            "transitions": None
            if sequence_rule.allowed_transitions is None
            else sorted(list(p) for p in sequence_rule.allowed_transitions),
        },
        "checks": [[c.name, c.expression] for c in (check_rules or [])],
    }
    if metric_rules:
        payload["metrics"] = [
            [
                m.name, m.metric, m.column, m.expression, m.q,
                m.min_bound, m.max_bound, m.severity,
            ]
            for m in metric_rules
        ]
    if drift_rule is not None:
        payload["drift"] = drift_rule.digest_payload()
    canonical = json.dumps(payload, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()
