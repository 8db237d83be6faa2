"""Scalar function surface — strings / dates / math / casts.

Reference: stdlib ``/root/reference/preql/modules/__builtins__.pql`` and
cast matrix ``/root/reference/preql/core/casts.py:8-127``.  All are
built-in Column expressions (codegen'd, vectorized) — the reference
lowers these to per-dialect SQL; here Catalyst does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---- strings (reference __builtins__.pql:141-161,282-358,462-513) ----

def upper(s) -> Column:
    return F.upper(_c(s))


def lower(s) -> Column:
    return F.lower(_c(s))


def length(s) -> Column:
    return F.length(_c(s))


def repeat(s, n) -> Column:
    """``"a" * 3`` / repeat(s, n) — __builtins__.pql:485-491."""
    return F.repeat(_c(s), n)


def str_index(sub, s) -> Column:
    """0-based index of ``sub`` in ``s``; -1 when missing
    (__builtins__.pql:462-477 — reference is 0-based, SQL instr is 1-based)."""
    return (F.instr(_c(s), sub) - 1).cast("long")


def str_contains(sub, s) -> Column:
    """Reference str_contains — __builtins__.pql:499-505; also the
    ``in`` operator on strings (compile_binops.py:147-152)."""
    return _c(s).contains(sub)


def str_notcontains(sub, s) -> Column:
    return ~_c(s).contains(sub)


def like(s, pattern: str) -> Column:
    """``~`` operator — compile_binops.py:247-249."""
    return _c(s).like(pattern)


def char(n) -> Column:
    """char(n) — __builtins__.pql:479-483."""
    return F.chr(_c(n))


def char_ord(c) -> Column:
    """char_ord(c) — __builtins__.pql:479-483."""
    return F.ascii(_c(c))


def char_range(a: str, b: str) -> Column:
    """char_range('a','c') → ['a','b','c'] — __builtins__.pql:580-589."""
    return F.transform(F.sequence(F.ascii(F.lit(a)), F.ascii(F.lit(b))),
                       lambda n: F.chr(n))


def str_slice(s, start, stop=None) -> Column:
    """String slicing ``s[a..b]`` — sql.StringSlice (sql.py:896-926),
    0-based like the reference."""
    if stop is None:
        return F.substring(_c(s), start + 1, 2 ** 31 - 1)
    return F.substring(_c(s), start + 1, stop - start)


def concat(*parts) -> Column:
    """String ``+`` — compile_binops.py:246; fmt() interpolation
    (pql_functions.py:132-169) lowers to the same concat."""
    return F.concat(*[_c(p) for p in parts])


# ---- math (compile_binops.py:211-243; __builtins__.pql:153-161,334-345) ----

def power(a, b) -> Column:
    return F.pow(_c(a), _c(b))


def round_(x, precision: int = 0) -> Column:
    """round(n, precision) incl. negative precision — __builtins__.pql:153-161."""
    return F.round(_c(x), precision)


def random() -> Column:
    return F.rand()


PI = 3.141592653589793


def now() -> Column:
    return F.current_timestamp()


# ---- timestamp properties (pql_functions.py:1085-1094) ----

def dt_hour(c) -> Column:
    return F.hour(_c(c))


def dt_minute(c) -> Column:
    return F.minute(_c(c))


def dt_day(c) -> Column:
    return F.dayofmonth(_c(c))


def dt_month(c) -> Column:
    return F.month(_c(c))


def dt_year(c) -> Column:
    return F.year(_c(c))


def dt_day_of_week(c) -> Column:
    """1=Sunday..7=Saturday (Spark convention; documented divergence
    from per-dialect variance in __builtins__.pql:347-353)."""
    return F.dayofweek(_c(c))


def dt_week_of_year(c) -> Column:
    return F.weekofyear(_c(c))


# ---- casts (casts.py:8-127; entry pql_functions.py:668-686) ----

def to_int(x) -> Column:
    """Checked string→int: reference raises on bad input
    (casts.py _cast_string_to_int); Spark cast yields null — we keep
    the null-on-failure vector semantics and offer try/strict via SQL
    ``CAST``/``TRY_CAST`` duality."""
    return _c(x).cast("long")


def to_int_checked(x) -> Column:
    """Checked string→int cast (reference casts.py:8-127: a
    non-numeric string raises instead of yielding NULL).  The check is
    a codegen'd CASE — no UDF; the error surfaces when the plan runs."""
    c = _c(x)
    cast = c.try_cast("long")
    return F.when(c.isNull() | cast.isNotNull(), cast).otherwise(
        F.raise_error(F.concat(F.lit("cannot cast to int: "),
                               c.cast("string"))).cast("long"))


def to_float(x) -> Column:
    return _c(x).cast("double")


def to_string(x) -> Column:
    return _c(x).cast("string")


def to_bool(x) -> Column:
    return _c(x).cast("boolean")


def to_timestamp(x, fmt: str | None = None) -> Column:
    return F.to_timestamp(_c(x), fmt) if fmt else _c(x).cast("timestamp")


# ---- json (additive; reference has T.json type but no functions,
#      pql_types.py:284-285) ----

def json_get(c, path: str) -> Column:
    return F.get_json_object(_c(c), path)
