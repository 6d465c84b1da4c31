"""m3spark — PySpark-native schema & constraint validation engine.

A from-scratch re-expression of JulesGosnell/m3's JSON Schema validation
as compiled columnar constraint predicates plus Arrow-vectorized pandas
UDFs, with table-scale checks (stats, uniqueness, referential, drift)
layered on top.  See SURVEY.md for the design mapping.
"""

__version__ = "0.1.0"
