"""Portable 60-bit hash: identical in Spark SQL and DuckDB SQL.

The round-1 scale operators (MinHash/LSH banding, SimHash) hash with
``xxhash64``, which DuckDB cannot reproduce — so the driver's oracle
gate could only do rows-only checks on them.  This helper derives a
60-bit integer from md5 (both engines produce identical lowercase-hex
md5), giving every hash-based operator a cross-engine-verifiable twin:

    Spark :  conv(substr(md5(concat_ws('|', salt, x)), 1, 15), 16, 10)
    DuckDB:  ('0x' || substr(md5(salt || '|' || x), 1, 15))::BIGINT

15 hex digits = 60 bits, so the value always fits a signed 64-bit int.
xxhash64 stays the default for pure-throughput paths (one JVM op vs
md5's digest cost); the portable variant is the verification path and
is still fully JVM-side (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(*cols: Column | str, salt: str = "") -> Column:
    """60-bit non-negative bigint hash of ``salt|col1|col2|...``."""
    parts = [F.lit(str(salt))] + [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols]
    return (F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15),
                   16, 10)
             .cast("long"))


def duckdb_hash60(expr: str, salt: str = "") -> str:
    """The DuckDB-SQL twin of :func:`portable_hash60` for oracle queries.
    ``expr`` must already be a varchar expression."""
    return (f"CAST(('0x' || substr(md5('{salt}' || '|' || ({expr})), 1, 15))"
            f" AS BIGINT)")
