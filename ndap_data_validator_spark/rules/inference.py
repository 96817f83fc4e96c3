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
