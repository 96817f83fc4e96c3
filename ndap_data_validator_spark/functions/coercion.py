"""Role/dtype coercion compiled to Catalyst expressions.

The reference coerces column-at-a-time in pandas and counts
``conversion_errors = max(#nulls_after - #nulls_before, 0)``
(``/root/reference/utils/validation.py:34-123``, ``200-231``). Coercion
never un-nulls a value, so that count is exactly the per-row predicate
``source IS NOT NULL AND coerced IS NULL`` summed — which is how this module
expresses it: each coercion compiles to a ``(value_expr, error_pred)`` pair
that the engine folds into ONE shared-scan ``agg`` (and reuses as a filter
to emit violation rows). No per-row Python anywhere.

Semantics parity notes (pandas quirk → Spark expression):
  * integer (validation.py:40-50): ``to_numeric`` then fractional values
    masked to NA and counted as errors → parse to double with ``try_cast``,
    null out where ``d % 1 != 0``, final value cast to bigint.
  * float (validation.py:53-57): ``try_cast(double)``.
  * boolean (validation.py:60-76): trim+lower token sets
    {true,t,yes,y,1} / {false,f,no,n,0}.
  * datetime (validation.py:79-85): pandas infers formats; we pin the
    accepted grammar to ISO date/timestamp variants via ``try_to_timestamp``
    fallbacks (inference is non-deterministic at scale and pandas-specific —
    documented divergence, fixtures use ISO).
  * date-only → ``date_trunc('day', ts)`` ≙ ``.dt.normalize()``.
  * string/category (validation.py:34-37, 88-90): cast to string, zero
    errors by construction (category is a pandas encoding detail; Parquet
    dictionary encoding happens below the type system).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.timeformat import (
    time_format_label,
    time_invalid_pred,
)

TRUE_TOKENS = ["true", "t", "yes", "y", "1"]
FALSE_TOKENS = ["false", "f", "no", "n", "0"]

# Accepted timestamp grammars for the pinned datetime coercion.
_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd-MM-yyyy",
]


@dataclass(frozen=True)
class CompiledCoercion:
    """A coercion compiled for one column.

    value_expr  — the coerced value (same name contract as the source col)
    error_pred  — per-row boolean: this row is a conversion error
    label_expr  — Time role only: the matched format label (else None)
    """

    source: str
    value_expr: Column
    error_pred: Column
    label_expr: Column | None = None


_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _nan_to_null(d: Column) -> Column:
    """Normalize double NaN → NULL. pandas ``isna()`` treats NaN as missing
    (so the reference's null/error counts fold NaN into nulls); Spark treats
    NaN as an ordinary non-null double — without this, a float-typed source
    containing NaN would diverge from the reference (ADVICE r01)."""
    return F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)


def _src_null(col: Column, src_type: str | None) -> Column:
    """'Missing in the pandas sense': NULL, or NaN for float-typed sources.
    Used by error predicates so a source NaN counts as a pre-existing null
    (never a conversion error), matching ``max(after - before, 0)``."""
    if src_type is not None and src_type in _FLOAT_TYPES:
        return col.isNull() | F.isnan(col)
    return col.isNull()


def _parse_double(col: Column, src_type: str | None) -> Column:
    """Numeric view of the column, NaN-normalized to NULL. Already-numeric
    sources skip the string→try_cast roundtrip (semantics-preserving:
    Spark's double→string is round-trippable, so parse(cast_to_string(x))
    ≡ x — but the direct cast stays in fast codegen instead of string
    formatting + parsing)."""
    if src_type is not None and src_type in _INT_TYPES:
        return col.cast("double")
    if src_type is not None and src_type in _FLOAT_TYPES:
        return _nan_to_null(col.cast("double"))
    if src_type is not None and src_type.startswith("decimal"):
        return col.cast("double")
    # string path: try_cast('NaN') yields NaN in Spark; pandas to_numeric
    # yields NaN too and then counts it as BOTH a conversion error and a
    # null — normalizing to NULL here makes the error predicate fire.
    return _nan_to_null(col.cast("string").try_cast("double"))


def coerce_to_string(col: Column) -> tuple[Column, Column]:
    return col.cast("string"), F.lit(False)


def coerce_to_integer(col: Column, src_type: str | None = None) -> tuple[Column, Column]:
    if src_type in _INT_TYPES:
        # integral source: no fractional values, no parse failures
        return col.cast("long"), F.lit(False)
    d = _parse_double(col, src_type)
    fractional = d.isNotNull() & (d % F.lit(1) != F.lit(0))
    value = F.when(fractional, F.lit(None).cast("double")).otherwise(d).cast("long")
    error = ~_src_null(col, src_type) & value.isNull()
    return value, error


def coerce_to_float(col: Column, src_type: str | None = None) -> tuple[Column, Column]:
    if src_type in _INT_TYPES:
        return col.cast("double"), F.lit(False)
    if src_type in _FLOAT_TYPES:
        # NaN folds into nulls (pandas isna parity); never an error.
        return _nan_to_null(col.cast("double")), F.lit(False)
    d = _parse_double(col, src_type)
    return d, ~_src_null(col, src_type) & d.isNull()


def coerce_to_boolean(col: Column) -> tuple[Column, Column]:
    norm = F.lower(F.trim(col.cast("string")))
    value = (
        F.when(norm.isin(TRUE_TOKENS), F.lit(True))
        .when(norm.isin(FALSE_TOKENS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return value, col.isNotNull() & value.isNull()


def coerce_to_datetime(col: Column, date_only: bool = False) -> tuple[Column, Column]:
    s = col.cast("string")
    ts = F.coalesce(
        F.try_to_timestamp(s),
        *[F.try_to_timestamp(s, F.lit(fmt)) for fmt in _TS_FORMATS],
    )
    if date_only:
        ts = F.date_trunc("day", ts)
    return ts, col.isNotNull() & ts.isNull()


def coerce_to_category(col: Column) -> tuple[Column, Column]:
    return col.cast("string"), F.lit(False)


def compile_dtype_coercion(column: str, dtype: str) -> CompiledCoercion:
    """Dtype-selection variant (coerce_dataframe_to_selected_types,
    validation.py:93-123). Unknown dtypes fall back to string, as the
    reference does (validation.py:116-117)."""
    col = F.col(column)
    if dtype == "integer":
        value, err = coerce_to_integer(col)
    elif dtype == "float":
        value, err = coerce_to_float(col)
    elif dtype == "boolean":
        value, err = coerce_to_boolean(col)
    elif dtype == "date":
        value, err = coerce_to_datetime(col, date_only=True)
    elif dtype == "datetime":
        value, err = coerce_to_datetime(col, date_only=False)
    elif dtype == "category":
        value, err = coerce_to_category(col)
    else:  # string + fallback
        value, err = coerce_to_string(col)
    return CompiledCoercion(source=column, value_expr=value, error_pred=err)


def compile_role_coercion(
    column: str,
    role: str,
    measure_type: str | None = None,
    time_date_only: bool = False,  # accepted for API parity (validation.py:204)
    src_type: str | None = None,
) -> CompiledCoercion:
    """Role-based variant (coerce_dataframe_by_roles, validation.py:200-231):
    Location→string, Time→string + format-error labeling, Measures→int/float,
    Others→category(string). Unassigned columns default to Others
    (validation.py:210)."""
    col = F.col(column)
    label: Column | None = None
    if role == "Location":
        value, err = coerce_to_string(col)
    elif role == "Time":
        # Kept as string; errors are per-row invalid formats — the
        # majority-format extra errors are aggregate-level and added by the
        # engine from the label counts (validation.py:180-188).
        value, _ = coerce_to_string(col)
        label = time_format_label(col)
        err = time_invalid_pred(col, label)
    elif role == "Measures":
        if (measure_type or "float") == "integer":
            value, err = coerce_to_integer(col, src_type)
        else:
            value, err = coerce_to_float(col, src_type)
    else:  # Others
        value, err = coerce_to_category(col)
    return CompiledCoercion(source=column, value_expr=value, error_pred=err, label_expr=label)
