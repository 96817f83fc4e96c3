from ndap_data_validator_spark.functions.coercion import (
    CompiledCoercion,
    compile_dtype_coercion,
    compile_role_coercion,
)
from ndap_data_validator_spark.functions.timeformat import (
    TIME_LABELS,
    TIME_PATTERNS,
    time_format_label,
    time_invalid_pred,
)

__all__ = [
    "CompiledCoercion",
    "compile_dtype_coercion",
    "compile_role_coercion",
    "TIME_LABELS",
    "TIME_PATTERNS",
    "time_format_label",
    "time_invalid_pred",
]
