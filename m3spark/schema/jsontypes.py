"""JSON type lattice and value semantics.

Re-expresses the reference's type semantics (m3: src/cljc/m3/type.cljc:22-63)
from scratch in Python:

- ``integer`` in draft-06+ means "number with zero fractional part": ``2.0``
  IS an integer (type.cljc:22-29).  Draft-03/04 are strict: only
  language-level integers count (type.cljc:31-42).
- Cross-type numeric equality: ``1 == 1.0`` under ``json_eq``
  (type.cljc:56-63), used by const/enum/uniqueItems.
- Booleans are NOT numbers (Python ``bool`` subclasses ``int`` — guard it).
- String length counts Unicode code points, surrogate-pair-aware
  (property.cljc:641-652 ``json-length``); Python ``len`` on ``str`` already
  counts code points, so astral chars are length 1, matching the reference.
"""

from __future__ import annotations

import math
from decimal import Decimal, InvalidOperation
from typing import Any

JSON_TYPES = ("null", "boolean", "object", "array", "number", "integer", "string")


def is_number(v: Any) -> bool:
    return isinstance(v, (int, float, Decimal)) and not isinstance(v, bool)


def is_integer_strict(v: Any) -> bool:
    """Draft-03/04 integer: language-level integer only (1.0 is NOT)."""
    return isinstance(v, int) and not isinstance(v, bool)


def is_integer_loose(v: Any) -> bool:
    """Draft-06+ integer: any number with zero fractional part (1.0 IS)."""
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return True
    if isinstance(v, float):
        return math.isfinite(v) and v == int(v)
    if isinstance(v, Decimal):
        return v.is_finite() and v == v.to_integral_value()
    return False


def json_type(v: Any) -> str:
    """Primary JSON type name of a Python value (integer folded into number)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if is_number(v):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v)!r}")


def type_check(v: Any, tname: str, strict_integer: bool) -> bool:
    """Does value ``v`` satisfy JSON Schema type name ``tname``?

    ``strict_integer`` selects draft-03/04 integer semantics.
    In draft-03, ``any`` matches everything.
    """
    if tname == "any":
        return True
    if tname == "integer":
        return is_integer_strict(v) if strict_integer else is_integer_loose(v)
    if tname == "number":
        return is_number(v)
    return json_type(v) == tname


def json_eq(a: Any, b: Any) -> bool:
    """Deep JSON equality with cross-type numeric tolerance (1 == 1.0),
    but booleans never equal numbers (true != 1)."""
    a_bool, b_bool = isinstance(a, bool), isinstance(b, bool)
    if a_bool or b_bool:
        return a_bool and b_bool and a is b
    if is_number(a) and is_number(b):
        # exact MATHEMATICAL value equality across int/float/Decimal.
        # Decimal(float) is the exact binary expansion — Decimal(str(x))
        # would compare the shortest round-trip decimal instead, which
        # breaks at the long boundary (str(float(2^63)) reads back as
        # ...776000, not the double's exact ...775808, making
        # 2^63 != float(2^63)).  The reference computes (zero? (- l r))
        # with float contagion (type.cljc:56-58), which agrees with the
        # exact rule everywhere both sides are exactly representable;
        # where contagion rounds an integer ONTO a double (2^53+1 vs
        # 2^53.0) we follow the spec's mathematical equality instead —
        # enumerated divergence, see COVERAGE.md.
        try:
            return Decimal(a) == Decimal(b)
        except (InvalidOperation, ValueError):  # nan
            return float(a) == float(b)
    if isinstance(a, dict) and isinstance(b, dict):
        if a.keys() != b.keys():
            return False
        return all(json_eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b):
            return False
        return all(json_eq(x, y) for x, y in zip(a, b))
    if type(a) is not type(b):
        return False
    return a == b


def _freeze(v: Any) -> Any:
    """Hashable canonical form under json_eq, for O(n) uniqueItems."""
    if isinstance(v, bool):
        return ("b", v)
    if is_number(v):
        try:
            d = Decimal(str(v)).normalize()
        except InvalidOperation:
            d = v
        return ("n", d)
    if isinstance(v, str):
        return ("s", v)
    if v is None:
        return ("z",)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_freeze(x) for x in v))
    if isinstance(v, dict):
        return ("o", frozenset((k, _freeze(x)) for k, x in v.items()))
    return ("?", v)


def unique_items(arr: list) -> bool:
    """True iff no two elements are json_eq-equal. O(n) via freezing."""
    seen = set()
    for x in arr:
        f = _freeze(x)
        if f in seen:
            return False
        seen.add(f)
    return True


def json_length(s: str) -> int:
    """Code-point length (Python str len is already code-point based)."""
    return len(s)


def is_multiple_of(v: Any, d: Any) -> bool:
    """Exact multiple check via Decimal, avoiding float modulo error
    (reference: property.cljc:610-632 uses BigDecimal).  The context
    precision is widened so remainders across the full double exponent
    range stay exact (1e300 % 0.01 needs ~320 digits; the default
    28-digit context raises InvalidOperation, which BigDecimal — being
    arbitrary-precision — never does)."""
    import decimal
    try:
        with decimal.localcontext() as ctx:
            ctx.prec = 700
            dv = Decimal(str(v))
            dd = Decimal(str(d))
            if dd == 0:
                return False
            return (dv % dd) == 0
    except (InvalidOperation, ValueError, ArithmeticError):
        try:
            return float(v) % float(d) == 0.0
        except (ZeroDivisionError, OverflowError, ValueError):
            return False
