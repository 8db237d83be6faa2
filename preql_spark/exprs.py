"""Expression semantics layer — Preql's null/truthiness rules on Spark
Columns (SURVEY.md §7.4 "hard parts").

Reference semantics being reproduced:
- ``==`` / ``!=`` are null-safe: ``null == null`` is true
  (``/root/reference/preql/core/compile_binops.py:24-25``; compiled to
  dialect "is not distinct from" — ``preql/core/sql.py:336-370``).
  Spark: ``eqNullSafe`` / negation thereof.
- ``and`` / ``or`` / ``not`` have *value* semantics like Python — they
  return an operand, not a bool (vectorized to CASE WHEN at
  ``compiler.py:313-339``).  Spark: ``F.when``.
- ``/`` is always float division; ``//`` (Preql ``/~``) is floor
  division (``compile_binops.py:211-216``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def eq(a, b) -> Column:
    """Null-safe equality: Preql ``==``."""
    return F.lit(a).eqNullSafe(b) if not isinstance(a, Column) else a.eqNullSafe(b)


def ne(a, b) -> Column:
    """Null-safe inequality: Preql ``!=`` / ``<>``."""
    return ~eq(a, b)


def truthy(x) -> Column:
    """Preql truthiness of a vectorized value: 0 / "" / null are falsy
    (interpreter path at evaluate.py:509-546 calls cast_to_python bool).
    Implemented via string form so it is type-agnostic and safe under
    ANSI mode (a direct string→boolean cast raises in Spark 4)."""
    x = x if isinstance(x, Column) else F.lit(x)
    s = x.cast("string")
    return F.when(x.isNull(), F.lit(False)).otherwise(
        ~s.isin("", "0", "0.0", "false"))


def pand(a, b) -> Column:
    """Preql ``a and b``: returns ``b`` if ``a`` is truthy else ``a``
    (value semantics, compiler.py:313-332)."""
    a = a if isinstance(a, Column) else F.lit(a)
    return F.when(truthy(a), b).otherwise(a)


def por(a, b) -> Column:
    """Preql ``a or b``: returns ``a`` if truthy else ``b``."""
    a = a if isinstance(a, Column) else F.lit(a)
    return F.when(truthy(a), a).otherwise(b)


def pnot(a) -> Column:
    """Preql ``not a`` → boolean."""
    return ~truthy(a)


def fdiv(a, b) -> Column:
    """Preql ``/`` — always float (compile_binops.py:211-216)."""
    a = a if isinstance(a, Column) else F.lit(a)
    return a.cast("double") / b


def idiv(a, b) -> Column:
    """Preql ``/~`` — floor division."""
    return F.floor((a if isinstance(a, Column) else F.lit(a)) / b).cast("long")


def if_else(cond, then, otherwise) -> Column:
    """Preql ``if/else`` expression → CASE (compiler.py:172-181)."""
    return F.when(truthy(cond), then).otherwise(otherwise)


class _This:
    """Deferred column reference: ``this.x`` builds ``F.col("x")`` when
    resolved against a table — the front-end analogue of the reference's
    name resolution inside projections (compiler.py:186-280). Supports
    nested struct fields: ``this.center.x``."""

    def __init__(self, path: tuple[str, ...] = ()):
        self._path = path

    def __getattr__(self, name: str) -> Column:
        if name.startswith("_"):
            raise AttributeError(name)
        return F.col(".".join(self._path + (name,)))

    def __getitem__(self, name: str) -> Column:
        return F.col(".".join(self._path + (name,)))


this = _This()
