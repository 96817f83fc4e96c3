"""Role / dtype inference — the engine's version of the reference's
``guess_datatype_option_for_series`` (utils/validation.py:22-31) and
``guess_role_for_series`` (utils/validation.py:189-197).

The reference guesses from pandas dtypes + column-name tokens; here the
Spark schema is authoritative (no data scan needed — inference is O(#cols),
pure metadata):
  * datetime-typed column OR name containing date|time|year|month → Time
  * integral type → Measures/integer; fractional type → Measures/float
  * everything else → Others
(The reference never guesses Location; parity preserved.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

from ndap_data_validator_spark.rules.model import ColumnAssignment

_NAME_TIME_TOKENS = ("date", "time", "year", "month")
_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FRACTIONAL = (FloatType, DoubleType, DecimalType)
_TEMPORAL = (DateType, TimestampType, TimestampNTZType)


def guess_dtype(dt: DataType) -> str:
    """Physical-type guess in the reference's DATATYPE_OPTIONS vocabulary."""
    if isinstance(dt, _INTEGRAL):
        return "integer"
    if isinstance(dt, _FRACTIONAL):
        return "float"
    if dt.typeName() == "boolean":
        return "boolean"
    if isinstance(dt, _TEMPORAL):
        return "datetime"
    return "string"


def guess_role(name: str, dt: DataType) -> tuple[str, str | None]:
    """(role, measure_type) guess; name tokens beat numeric dtypes, exactly
    like the reference's precedence (datetime/name → Time first)."""
    lowered = (name or "").lower()
    if isinstance(dt, _TEMPORAL) or any(t in lowered for t in _NAME_TIME_TOKENS):
        return "Time", None
    if isinstance(dt, _INTEGRAL):
        return "Measures", "integer"
    if isinstance(dt, _FRACTIONAL):
        return "Measures", "float"
    return "Others", None


def guess_assignments(df: DataFrame) -> list[ColumnAssignment]:
    """One inferred ColumnAssignment per column — the starting point a user
    would adjust, as the reference's role-assignment UI pre-fills."""
    return [
        ColumnAssignment(column=f.name, role=r, measure_type=mt)
        for f in df.schema.fields
        for r, mt in [guess_role(f.name, f.dataType)]
    ]


# --- data-driven profiling (north-star: rule bootstrap) ---------------------
#
# The metadata layer above mirrors the reference's preview-time guess
# (utils/validation.py:189-197). A 100 TB pipeline also wants the DRAFT
# CONSTRAINTS a profiler observes in the data itself — null rates, value
# ranges, low-cardinality domains, and whether a string column is secretly
# numeric/temporal. One aggregate pass over the table computes all of it
# (map-side partial agg, one tiny shuffle); a second, tiny pass collects
# exact domains only for the few columns the sketch says are small.

_REGEX_CANDIDATES: dict[str, str] = {
    # full-match candidates, CHEAP and portable (same class the coercion
    # rules use); fraction-of-non-null matched is computed per candidate
    "integer": r"^[+-]?\d+$",
    "fractional": r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$",
    "iso_date": r"^\d{4}-\d{2}-\d{2}$",
    "iso_datetime": r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$",
    "boolean": r"^(?i)(true|false|t|f|yes|no|y|n|0|1)$",
}


def profile_agg_frame(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """The profiler's ONE-row aggregate frame (exposed for plan audits):
    every statistic for every column in a single partial-aggregated agg."""
    from pyspark.sql import functions as F

    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, q = f.name, F.col(f.name)
        aggs.append(F.count(F.when(q.isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__nd"))
        if isinstance(f.dataType, _INTEGRAL + _FRACTIONAL + _TEMPORAL):
            aggs.append(F.min(q).alias(f"{c}__min"))
            aggs.append(F.max(q).alias(f"{c}__max"))
        if isinstance(f.dataType, _INTEGRAL + _FRACTIONAL):
            # moments feed suggest_metric_rules' mean-drift bounds; same
            # shared agg, two more partial-aggregated expressions
            aggs.append(F.avg(q.cast("double")).alias(f"{c}__mean"))
            aggs.append(F.stddev_samp(q.cast("double")).alias(f"{c}__sd"))
        if f.dataType.typeName() == "string":
            for label, pat in _REGEX_CANDIDATES.items():
                aggs.append(
                    F.avg(q.rlike(pat).cast("double")).alias(
                        f"{c}__re_{label}"
                    )
                )
    return df.agg(*aggs)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    max_domain_size: int = 20,
) -> list[dict]:
    """Observed per-column profile, ONE aggregate pass:
    ``{column, dtype, n, nulls, null_frac, n_distinct_approx, min, max,
    regex_fracs, domain}``. ``domain`` is the exact sorted value set for
    string columns whose approx distinct count is ≤ max_domain_size
    (collected in a second pass restricted to those columns — the partial
    ``collect_set`` stays bounded because the cardinality is, so the pass
    is safe at any row count); None elsewhere.
    """
    from pyspark.sql import functions as F

    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    row = profile_agg_frame(df, columns).first().asDict()

    domain_cols = [
        f.name
        for f in fields
        if f.dataType.typeName() == "string"
        and row[f"{f.name}__nd"] <= max_domain_size
    ]
    domains: dict[str, list] = {}
    if domain_cols:
        drow = df.agg(
            *[
                F.sort_array(F.collect_set(c)).alias(c)
                for c in domain_cols
            ]
        ).first()
        for c in domain_cols:
            vals = list(drow[c])
            # the sketch can under-count (~5% rsd): trust only exact size
            if len(vals) <= max_domain_size:
                domains[c] = vals

    n = row["__n"]
    out = []
    for f in fields:
        c = f.name
        out.append(
            {
                "column": c,
                "dtype": guess_dtype(f.dataType),
                "n": n,
                "nulls": row[f"{c}__nulls"],
                "null_frac": (row[f"{c}__nulls"] / n) if n else 0.0,
                "n_distinct_approx": row[f"{c}__nd"],
                "min": row.get(f"{c}__min"),
                "max": row.get(f"{c}__max"),
                "mean": row.get(f"{c}__mean"),
                "stddev": row.get(f"{c}__sd"),
                "regex_fracs": {
                    label: row.get(f"{c}__re_{label}")
                    for label in _REGEX_CANDIDATES
                    if f"{c}__re_{label}" in row
                },
                "domain": domains.get(c),
            }
        )
    return out


def profile_and_suggest(
    df: DataFrame,
    columns: list[str] | None = None,
    max_domain_size: int = 20,
    regex_threshold: float = 1.0,
) -> tuple[list[ColumnAssignment], list[dict]]:
    """Draft rule bootstrap: ``(assignments, profile)``.

    Starts from the reference-parity metadata guess and folds in what the
    profile observed — a DRAFT a user reviews (exactly the reference's
    role-assignment UI flow, pre-filled one level deeper):
      * numeric columns get the observed [min, max] range rule;
      * small-domain string columns get an ``allowed_values`` rule;
      * string columns whose non-null values ALL match a numeric candidate
        are re-drafted as Measures (integer beats fractional when both hit);
        all-ISO-date/datetime strings are re-drafted as Time;
      * ``regex_threshold`` < 1.0 loosens the 'all' to a fraction (draft
        mode for dirty data — the rule will then FLAG the stragglers).

    not_null is deliberately NOT suggested from observed zero nulls: the
    mandatory-role contract owns nullability, and "no nulls in this
    snapshot" is the classic profiler false promise.
    """
    prof = profile_columns(df, columns, max_domain_size)
    by_col = {p["column"]: p for p in prof}
    out = []
    for f in df.schema.fields:
        if f.name not in by_col:
            continue
        p = by_col[f.name]
        role, mt = guess_role(f.name, f.dataType)
        kwargs: dict = {}
        if p["dtype"] in ("integer", "float") and p["min"] is not None:
            kwargs["min_value"] = float(p["min"])
            kwargs["max_value"] = float(p["max"])
        fr = p["regex_fracs"]
        if f.dataType.typeName() == "string" and p["nulls"] < p["n"]:
            if fr.get("integer") is not None and fr["integer"] >= regex_threshold:
                role, mt = "Measures", "integer"
            elif (
                fr.get("fractional") is not None
                and fr["fractional"] >= regex_threshold
            ):
                role, mt = "Measures", "float"
            elif (
                fr.get("iso_date", 0) or 0
            ) >= regex_threshold or (
                fr.get("iso_datetime", 0) or 0
            ) >= regex_threshold:
                role, mt = "Time", None
        # domain rule only for columns whose FINAL draft role is Others —
        # a {'0','1'} column re-drafted Measures must not also carry an
        # allowed-values rule fighting the numeric coercion
        if p["domain"] is not None and role == "Others":
            kwargs["allowed_values"] = tuple(p["domain"])
        out.append(
            ColumnAssignment(column=f.name, role=role, measure_type=mt, **kwargs)
        )
    return out, prof


def suggest_metric_rules(
    profile: list[dict],
    row_count_slack: tuple[float, float] = (0.5, 2.0),
    null_floor: float = 0.001,
    null_slack: float = 1.5,
    mean_sd_slack: float = 1.0,
    range_pad_frac: float = 0.1,
    domain_slack: float = 0.001,
    key_ratio_trigger: float = 0.95,
    severity: str = "warn",
    now: str | None = None,
    freshness_slack: float = 2.0,
    freshness_floor: float = 3600.0,
) -> list:
    """Deequ-style constraint suggestion: derive dataset-level
    ``MetricRule``s (operators/expectations.py) from a ``profile_columns``
    snapshot of a HEALTHY baseline, so future batches are asserted against
    what the baseline actually looked like. Profile once, gate forever —
    the draft a user reviews and promotes (which is why ``severity``
    defaults to 'warn': heuristic bounds alert first, block only after a
    human tightens them).

    Suggested per baseline observation:
      * ``row_count`` within ``n × row_count_slack`` (the half-empty-batch
        alarm);
      * per-column ``null_fraction`` ≤ max(observed × null_slack,
        null_floor) — a zero-null snapshot is NOT promised to stay
        zero-null (the classic profiler false promise), it gets the floor;
      * numeric columns: ``mean`` within observed mean ± mean_sd_slack ×
        stddev, and ``min``/``max`` within the observed range padded by
        range_pad_frac × span (aggregate-level drift alarms);
      * exact small-domain string columns: ``compliance`` of
        ``col IS NULL OR col IN (domain)`` ≥ 1 − domain_slack (nullability
        stays the null rule's job);
      * key-like columns (approx distinct ratio ≥ key_ratio_trigger):
        ``distinct_ratio`` ≥ key_ratio_trigger − 0.05 (HLL headroom);
      * datetime columns, when ``now`` (ISO-8601 UTC — the instant the
        baseline was profiled) is given: ``freshness`` ≤ max(observed lag
        × freshness_slack, freshness_floor) — the batch-cadence alarm; the
        matching evaluation passes its own ``now=`` to
        ``metric_expectations``, so the bound is the only thing baked in.

    Returns plain MetricRules — feed to ``metric_expectations`` or
    ``run_validation(metric_rules=…)``; rule names are
    ``<column>__<metric>`` (``rows__row_count`` for the frame rule) so
    suites from different baselines diff cleanly.
    """
    from ndap_data_validator_spark.operators.expectations import MetricRule

    rules: list = []
    if not profile:
        return rules
    n = profile[0]["n"]
    if n:
        rules.append(
            MetricRule(
                "rows__row_count",
                "row_count",
                min_bound=max(1.0, n * row_count_slack[0]),
                max_bound=n * row_count_slack[1],
                severity=severity,
            )
        )
    for p in profile:
        c = p["column"]
        nf = p.get("null_frac") or 0.0
        rules.append(
            MetricRule(
                f"{c}__null_fraction",
                "null_fraction",
                column=c,
                max_bound=min(1.0, max(nf * null_slack, null_floor)),
                severity=severity,
            )
        )
        mean, sd = p.get("mean"), p.get("stddev")
        if mean is not None:
            spread = (sd or 0.0) * mean_sd_slack or max(abs(mean) * 0.1, 1e-9)
            rules.append(
                MetricRule(
                    f"{c}__mean",
                    "mean",
                    column=c,
                    min_bound=mean - spread,
                    max_bound=mean + spread,
                    severity=severity,
                )
            )
        if (
            p.get("dtype") in ("integer", "float")
            and p.get("min") is not None
            and p.get("max") is not None
        ):
            lo, hi = float(p["min"]), float(p["max"])
            pad = (hi - lo) * range_pad_frac
            rules.append(
                MetricRule(
                    f"{c}__min", "min", column=c, min_bound=lo - pad,
                    severity=severity,
                )
            )
            rules.append(
                MetricRule(
                    f"{c}__max", "max", column=c, max_bound=hi + pad,
                    severity=severity,
                )
            )
        if p.get("domain"):
            # escape for Spark's default string-literal grammar: backslash
            # is an escape character (a domain value like 'C:\temp' would
            # otherwise compile to a TAB, and a trailing '\' swallows the
            # closing quote → ParseException on every batch)
            quoted = ", ".join(
                "'"
                + str(v).replace("\\", "\\\\").replace("'", "''")
                + "'"
                for v in p["domain"]
            )
            rules.append(
                MetricRule(
                    f"{c}__domain",
                    "compliance",
                    expression=f"`{c}` IS NULL OR `{c}` IN ({quoted})",
                    min_bound=1.0 - domain_slack,
                    severity=severity,
                )
            )
        nd = p.get("n_distinct_approx")
        if n and nd is not None and nd / n >= key_ratio_trigger:
            rules.append(
                MetricRule(
                    f"{c}__distinct_ratio",
                    "distinct_ratio",
                    column=c,
                    min_bound=max(0.0, key_ratio_trigger - 0.05),
                    severity=severity,
                )
            )
        if now is not None and p.get("dtype") == "datetime" and p.get("max") is not None:
            from ndap_data_validator_spark.operators.expectations import (
                _now_epoch,
            )

            mx = p["max"]
            if mx.tzinfo is None:
                from datetime import timezone

                mx = mx.replace(tzinfo=timezone.utc)
            lag = _now_epoch(now) - mx.timestamp()
            rules.append(
                MetricRule(
                    f"{c}__freshness",
                    "freshness",
                    column=c,
                    max_bound=max(lag * freshness_slack, freshness_floor),
                    severity=severity,
                )
            )
    return rules
