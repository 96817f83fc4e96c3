"""Unit tests for the compiled coercions (SURVEY.md §2.3, C1-C6).

Edge cases taken from reference semantics:
  * fractional values are integer conversion errors AND become null
    (validation.py:43-46);
  * error count = nulls_after − nulls_before, floored at 0
    (validation.py:47-50) — expressed per-row as src NOT NULL AND coerced
    NULL, so the floor is structural;
  * boolean token sets on trimmed/lowercased strings (validation.py:60-76);
  * string/category coercions never error (validation.py:34-37, 88-90).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.coercion import (
    compile_dtype_coercion,
)


def _run(spark, values, dtype):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    c = compile_dtype_coercion("v", dtype)
    out = df.select(
        c.value_expr.alias("value"),
        c.error_pred.cast("int").alias("err"),
    ).collect()
    return [r["value"] for r in out], sum(r["err"] for r in out)


def test_integer_fractional_is_error(spark):
    vals, errs = _run(spark, ["1", "2.0", "2.5", "x", None, " 7 "], "integer")
    assert vals == [1, 2, None, None, None, 7]
    assert errs == 2  # "2.5" fractional + "x" unparseable; None is NOT an error


def test_integer_negative_fractional(spark):
    vals, errs = _run(spark, ["-3", "-3.5"], "integer")
    assert vals == [-3, None]
    assert errs == 1


def test_float(spark):
    vals, errs = _run(spark, ["1.5", "2", "junk", None, "1e3"], "float")
    assert vals == [1.5, 2.0, None, None, 1000.0]
    assert errs == 1


def test_boolean_tokens(spark):
    vals, errs = _run(
        spark,
        ["true", " T ", "yes", "Y", "1", "false", "F", "no", "N", "0", "maybe", None],
        "boolean",
    )
    assert vals == [True, True, True, True, True, False, False, False, False, False, None, None]
    assert errs == 1


def test_string_and_category_never_error(spark):
    for dtype in ("string", "category"):
        vals, errs = _run(spark, ["a", None, "1.5"], dtype)
        assert vals == ["a", None, "1.5"]
        assert errs == 0


def test_datetime_iso(spark):
    vals, errs = _run(
        spark,
        ["2024-01-02T03:04:05", "2024-01-02 03:04:05", "2024-01-02", "not a date", None],
        "datetime",
    )
    assert vals[0] is not None and vals[1] is not None and vals[2] is not None
    assert vals[3] is None and vals[4] is None
    assert errs == 1


def test_date_only_truncates_to_midnight(spark):
    vals, _ = _run(spark, ["2024-01-02T03:04:05"], "date")
    assert vals[0].hour == 0 and vals[0].minute == 0


def test_unknown_dtype_falls_back_to_string(spark):
    vals, errs = _run(spark, ["zzz"], "geometry")
    assert vals == ["zzz"] and errs == 0


def test_numeric_source_column(spark):
    # roles apply to already-typed columns too: double → integer coercion
    df = spark.createDataFrame([(1.0,), (2.5,), (None,)], "v double")
    c = compile_dtype_coercion("v", "integer")
    out = df.select(c.value_expr.alias("value"), c.error_pred.cast("int").alias("err")).collect()
    assert [r["value"] for r in out] == [1, None, None]
    assert sum(r["err"] for r in out) == 1
