"""Columnar constraint compiler — the JVM-side hot path."""

from .compiler import ColumnarValidator, UnsupportedKeyword  # noqa: F401
