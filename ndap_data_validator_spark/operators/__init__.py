from ndap_data_validator_spark.operators.coerce import (
    coerce_by_dtypes,
    coerce_by_roles,
    null_census,
)
from ndap_data_validator_spark.operators.validate import (
    GLOBAL_PARTITION,
    ValidationEngine,
    ValidationResult,
)

__all__ = [
    "GLOBAL_PARTITION",
    "ValidationEngine",
    "ValidationResult",
    "coerce_by_dtypes",
    "coerce_by_roles",
    "null_census",
]
