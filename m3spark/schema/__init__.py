"""Pure-Python JSON Schema compile-once/validate-many core.

Driver-side schema compiler + closure-tree validator; also shipped to
executors inside Arrow-batched pandas UDFs (see :mod:`m3spark.sparkval`).
"""

from .core import (  # noqa: F401
    CompiledSchema,
    SchemaError,
    ValidationResult,
    Violation,
    compile_schema,
    draft_of,
    validate,
)
from .jsontypes import json_eq, json_type, unique_items  # noqa: F401
from .formats import FORMATS, SPARK_RLIKE  # noqa: F401
