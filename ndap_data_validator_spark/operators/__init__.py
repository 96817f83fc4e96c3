from ndap_data_validator_spark.operators.validate import (
    GLOBAL_PARTITION,
    ValidationEngine,
    ValidationResult,
)

__all__ = ["GLOBAL_PARTITION", "ValidationEngine", "ValidationResult"]
