"""ndap_data_validator_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the query/data-processing capabilities of
``suseel96/ndap_data_validator`` (reference at /root/reference) on Apache
Spark: a rule catalog (role-based type conformance, null/range/regex checks,
time-format consistency), per-column stats, uniqueness, referential
integrity and distribution-drift checks — all compiled to Catalyst column
expressions and evaluated in a single shared scan per partition, with
per-partition pass/fail reports, violation rows, and checkpoint/resume.

Reference semantics cited throughout as ``/root/reference/<file>:<line>``.
Nothing here is a port: the reference is eager per-column pandas inside a
FastAPI app; this engine is declarative DataFrame plans.
"""

from ndap_data_validator_spark.rules.model import (
    ColumnAssignment,
    RuleCatalog,
    load_default_catalog,
)
from ndap_data_validator_spark.operators.validate import (
    ValidationEngine,
    ValidationResult,
)

__all__ = [
    "ColumnAssignment",
    "RuleCatalog",
    "load_default_catalog",
    "ValidationEngine",
    "ValidationResult",
]

__version__ = "0.1.0"
