"""A Preql-syntax query front-end compiling directly to DataFrame ops.

Covers the language core (reference grammar
``/root/reference/preql/core/preql.lark``, 197 lines — ours is a
deliberately small recursive-descent subset, NOT a port of the Lark
LALR pipeline):

    Person[age > 18]{name, age}            selection + projection
    Person{country => count(), names: name} group-by (bare col → array)
    t order {a, ^b}                        multi-key sort, ^ desc
    t[3..8]                                slice (OFFSET/LIMIT)
    [1..100]                               integer range table
    join(a: Person, b: Country)            n-ary struct join (FK auto)
    count(t) / sum(t{x}) ...               whole-table aggregates
    arithmetic + - * / /~ %, comparisons == != < > <= >= ~ (like),
    and/or/not, in, function calls, dotted access (j{a.name})

Compilation model (mirrors SURVEY §3.4's "new engine IR"): source →
tokens → direct evaluation against (engine, current-table context) →
Table / Column.  Projection/aggregation context decides whether a bare
column is a value or becomes ``collect_list`` — the role of the
reference's phantom types (pql_types.py:279-280), carried here as a
plain flag.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from preql_spark import exprs
from preql_spark.table import Table, desc as desc_marker

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<dots>\.\.\.|\.\.)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>"[^"]*"|'[^']*')
  | (?P<op>==|!=|<=|>=|=>|!in|/~|\*\*|[-+*/%<>=~^(){}\[\],:.!|&;?])
""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "in", "order", "new", "one", "null",
             "true", "false", "func", "if", "else"}


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(src: str) -> list[Tok]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"cannot tokenize at: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text in _KEYWORDS:
            kind = text
        out.append(Tok(kind, text))
    out.append(Tok("eof", ""))
    return out


class Parser:
    """Recursive-descent evaluator: parse and compile in one pass."""

    def __init__(self, engine, src: str, env: dict | None = None):
        self.engine = engine
        self.toks = tokenize(src)
        self.i = 0
        self.env = env or {}
        # evaluation context: current table for name resolution, and
        # whether we're on the aggregation side of `=>`
        self.table: Table | None = None
        self.in_agg = False

    # ---- token helpers ---------------------------------------------
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            raise SyntaxError(
                f"expected {text or kind}, got {self.peek().text!r}")
        return t

    # ---- entry -----------------------------------------------------
    def parse(self):
        """Program: statements separated by ``;``; the value of the
        last statement is the result (reference scripts behave the
        same — the REPL echoes the last expression)."""
        v = None
        while self.peek().kind != "eof":
            v = self.statement()
            while self.accept("op", ";"):
                pass
        self.expect("eof")
        if isinstance(v, Column):
            # a table-free scalar expression ("a" in "abc", 2 ** 10):
            # localize it like the reference interpreter would
            # (cast_to_python, evaluate.py:338-356) — one-row plan,
            # no table scan
            v = self.engine.spark.range(1).select(v.alias("v")) \
                .collect()[0]["v"]
        return v

    def statement(self):
        """``func name(params) = expr`` | ``name = expr`` | expr.
        Like the reference interpreter, assignment binds into the
        environment; function bodies are captured unevaluated and
        inlined at each call site (eval_func_call,
        evaluate.py:579-648)."""
        if self.peek().kind == "func":
            return self._func_def()
        if self.peek().kind == "name" and self.peek(1).kind == "op" \
                and self.peek(1).text == "=":
            name = self.next().text
            self.next()
            val = self.expr()
            self.env[name] = val
            return val
        return self.expr()

    def _func_def(self):
        self.expect("func")
        name = self.expect("name").text
        self.expect("op", "(")
        params = []
        while not self.accept("op", ")"):
            params.append(self.expect("name").text)
            self.accept("op", ",")
        self.expect("op", "=")
        # capture the body's token span unevaluated (to the next
        # top-level ';' or eof); it re-parses per call with parameters
        # bound — true compile-time inlining, no UDF
        start, depth = self.i, 0
        while True:
            t = self.peek()
            if t.kind == "eof" or (depth == 0 and t.kind == "op"
                                   and t.text == ";"):
                break
            if t.kind == "op" and t.text in "([{":
                depth += 1
            elif t.kind == "op" and t.text in ")]}":
                depth -= 1
            self.next()
        fn = _UserFunc(name, params, self.toks[start:self.i] + [Tok("eof", "")])
        self.env[name] = fn
        return fn

    # ---- expression ladder (precedence per preql.lark) -------------
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        v = self.and_expr()
        while self.accept("or"):
            r = self.and_expr()
            v = exprs.por(self._col(v), self._col(r))
        return v

    def and_expr(self):
        v = self.not_expr()
        while self.accept("and"):
            r = self.not_expr()
            v = exprs.pand(self._col(v), self._col(r))
        return v

    def not_expr(self):
        if self.accept("not"):
            return exprs.pnot(self._col(self.not_expr()))
        return self.comparison()

    def comparison(self):
        v = self.additive()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("==", "!=", "<", ">", "<=", ">=", "~"):
                self.next()
                r = self.additive()
                a, b = self._col(v), r if isinstance(r, (int, float, str)) else self._col(r)
                v = {"==": lambda: exprs.eq(a, b),
                     "!=": lambda: exprs.ne(a, b),
                     "<": lambda: a < b, ">": lambda: a > b,
                     "<=": lambda: a <= b, ">=": lambda: a >= b,
                     "~": lambda: a.like(b)}[t.text]()
            elif t.kind in ("in", "op") and (t.kind == "in" or t.text == "!in"):
                negate = t.text == "!in"
                self.next()
                r = self.additive()
                if isinstance(r, Table):
                    # literal-membership path: the RHS materializes to
                    # the driver, so bound it — table-scale membership
                    # belongs in a semi-join (Table.in_table), which
                    # never collects
                    vals = [row[0] for row in r.df.limit(100_001).collect()]
                    if len(vals) > 100_000:
                        raise ValueError(
                            "`in <table>` RHS exceeds 100k rows; use "
                            "Table.in_table (semi-join) for table-scale "
                            "membership")
                    r = vals
                if isinstance(r, str):
                    # string-in-string is a substring test
                    # (compile_binops.py:147-152 str_contains)
                    v = F.lit(r).contains(self._col(v)) if not negate \
                        else ~F.lit(r).contains(self._col(v))
                else:
                    v = self._col(v).isin(r) if not negate \
                        else ~self._col(v).isin(r)
            else:
                return v

    def additive(self):
        v = self.mult()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("+", "-"):
                self.next()
                r = self.mult()
                if isinstance(v, Table) and isinstance(r, Table):
                    v = (v + r) if t.text == "+" else (v - r)
                elif t.text == "+" and (self._is_stringy(v)
                                        or self._is_stringy(r)):
                    # string + string → concat (compile_binops.py:246-249)
                    v = F.concat(self._col(v), self._col(r))
                else:
                    a, b = self._col(v), self._col(r)
                    v = a + b if t.text == "+" else a - b
            elif t.kind == "op" and t.text in ("|", "&"):
                self.next()
                r = self.mult()
                v = (v | r) if t.text == "|" else (v & r)
            else:
                return v

    def mult(self):
        v = self.power()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("*", "/", "/~", "%"):
                self.next()
                r = self.power()
                if t.text == "*" and self._is_stringy(v):
                    # string * n → repeat (compile_binops.py:204-207)
                    v = F.repeat(self._col(v),
                                 r if isinstance(r, int) else self._col(r))
                    continue
                a = self._col(v)
                v = {"*": lambda: a * r if isinstance(r, (int, float)) else a * self._col(r),
                     "/": lambda: exprs.fdiv(a, self._col(r)),
                     "/~": lambda: exprs.idiv(a, self._col(r)),
                     "%": lambda: a % self._col(r)}[t.text]()
            else:
                return v

    def power(self):
        """``a ** b`` → power() (compile_binops.py:241-243); binds
        tighter than * and is right-associative like the reference."""
        v = self.unary()
        if self.peek().kind == "op" and self.peek().text == "**":
            self.next()
            r = self.power()
            return F.pow(self._col(v), r if isinstance(r, (int, float))
                         else self._col(r))
        return v

    def unary(self):
        if self.accept("op", "-"):
            return -self._col(self.unary())
        return self.postfix()

    # ---- postfix chains: t[...] t{...} t order {...} ---------------
    def postfix(self):
        v = self.atom()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text == "[" and isinstance(v, Table):
                self.next()
                v = self._selection_or_slice(v)
            elif t.kind == "op" and t.text == "[" \
                    and (isinstance(v, str) or isinstance(v, Column)):
                # string index / slice (compiler.py:555-597,
                # sql.StringSlice sql.py:896-926) — 0-based
                self.next()
                v = self._string_slice(v)
            elif t.kind == "op" and t.text == "{" and isinstance(v, Table):
                self.next()
                v = self._projection(v)
            elif t.kind == "order" and isinstance(v, Table):
                self.next()
                self.expect("op", "{")
                v = self._order(v)
            elif t.kind == "op" and t.text == ".":
                self.next()
                name = self.expect("name").text
                v = self._attr(v, name)
            elif t.kind == "op" and t.text == "(":
                self.next()
                v = self._call(v)
            else:
                return v

    def _string_slice(self, v):
        from preql_spark.functions import scalar as s
        first = None
        if self.peek().kind == "int":
            first = int(self.next().text)
        if self.accept("dots", ".."):
            stop = None
            if self.peek().kind == "int":
                stop = int(self.next().text)
            self.expect("op", "]")
            return s.str_slice(self._col(v), first or 0, stop)
        self.expect("op", "]")
        if first is None:
            raise SyntaxError("expected index or slice")
        return s.str_slice(self._col(v), first, first + 1)

    def _selection_or_slice(self, tab: Table):
        # peek for `a..b` slice
        save = self.i
        first = None
        if self.peek().kind == "int":
            first = int(self.next().text)
            if self.accept("dots", ".."):
                stop = None
                if self.peek().kind == "int":
                    stop = int(self.next().text)
                self.expect("op", "]")
                return tab.slice(first, stop)
            self.i = save
        if self.accept("dots", ".."):
            stop = int(self.expect("int").text)
            self.expect("op", "]")
            return tab.slice(0, stop)
        # conditions, comma-separated, ANDed
        conds = []
        prev_table, self.table = self.table, tab
        try:
            while not self.accept("op", "]"):
                conds.append(self._col(self.expr()))
                self.accept("op", ",")
        finally:
            self.table = prev_table
        return tab.filter(*conds)

    def _projection(self, tab: Table):
        prev_table, self.table = self.table, tab
        try:
            keys, kv = self._proj_items(stop_at=("=>",))
            if self.accept("op", "=>"):
                self.in_agg = True
                try:
                    _, agg_kv = self._proj_items(stop_at=())
                finally:
                    self.in_agg = False
                self.expect("op", "}")
                # group keys: bare columns (positional strings) keep
                # their names; named entries are computed keys
                by = {k: F.col(k) for k in keys if isinstance(k, str)}
                by.update(kv)
                return tab.group(by, **agg_kv)
            self.expect("op", "}")
            items = keys
            return tab.project(*items, **kv)
        finally:
            self.table = prev_table

    def _proj_items(self, stop_at=()):
        """Returns (positional items, named dict). Named fields get
        auto-names for bare columns / expressions like the reference
        (compiler.py:46-68)."""
        items: list = []
        named: dict = {}
        auto = 0
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("}",) or t.kind == "eof":
                break
            if t.kind == "op" and t.text == "=>":
                break
            if self.accept("dots", "..."):
                # optional exclusions: ... !name !name
                excl = []
                while self.accept("op", "!"):
                    excl.append(self.expect("name").text)
                if excl:
                    from preql_spark.table import exclude
                    items.append(exclude(*excl))
                else:
                    items.append(Ellipsis)
                self.accept("op", ",")
                continue
            # NAME ':' expr → named
            if t.kind == "name" and self.peek(1).kind == "op" \
                    and self.peek(1).text == ":":
                name = self.next().text
                self.next()
                named[name] = self._agg_col(self.expr())
            else:
                v = self.expr()
                if isinstance(v, Column):
                    # bare column keeps its own name when trivially a
                    # column reference; else auto-name
                    cname = _plain_col_name(v)
                    if cname is not None and not self.in_agg:
                        items.append(cname)
                    else:
                        named[cname or f"col{auto}"] = self._agg_col(v)
                        auto += 0 if cname else 1
                else:
                    named[f"col{auto}"] = self._agg_col(v)
                    auto += 1
            if not self.accept("op", ","):
                break
        return items, named

    def _agg_col(self, v):
        """On the agg side of ``=>``, a bare (non-aggregate) column
        becomes collect_list — reference MakeArray (compiler.py:59-63)."""
        col = self._col(v)
        if self.in_agg and _plain_col_name(col) is not None:
            return F.collect_list(col)
        return col

    def _order(self, tab: Table):
        keys = []
        prev_table, self.table = self.table, tab
        try:
            while not self.accept("op", "}"):
                if self.accept("op", "^"):
                    keys.append(desc_marker(self._col(self.expr())))
                else:
                    keys.append(self._col(self.expr()))
                self.accept("op", ",")
        finally:
            self.table = prev_table
        return tab.order(*keys)

    # ---- atoms -----------------------------------------------------
    def atom(self):
        t = self.next()
        if t.kind == "one":
            # ``one [?] molecule`` (preql.lark:130) — exactly-one-row
            # assertion returning a Row; ``one?`` allows 0 rows → None
            nullable = self.accept("op", "?") is not None
            v = self.postfix()
            if not isinstance(v, Table):
                raise TypeError("one expects a table")
            return v.one(nullable=nullable)
        if t.kind == "if":
            # vectorized ``if (cond) a else b`` → CASE
            # (ast.If in vector context, compiler.py:172-181)
            self.expect("op", "(")
            cond = self._col(self.expr())
            self.expect("op", ")")
            then = self.expr()
            self.expect("else")
            other = self.expr()
            return exprs.if_else(cond, self._col(then), self._col(other))
        if t.kind == "int":
            return int(t.text)
        if t.kind == "float":
            return float(t.text)
        if t.kind == "string":
            return t.text[1:-1]
        if t.kind == "null":
            return F.lit(None)
        if t.kind in ("true", "false"):
            return F.lit(t.kind == "true")
        if t.kind == "op" and t.text == "(":
            v = self.expr()
            self.expect("op", ")")
            return v
        if t.kind == "op" and t.text == "[":
            return self._list_or_range()
        if t.kind == "name":
            return self._name(t.text)
        raise SyntaxError(f"unexpected token {t.text!r}")

    def _list_or_range(self):
        # [a..b] range table | [x, y, z] list table
        if self.peek().kind == "int" and self.peek(1).kind == "dots":
            a = int(self.next().text)
            self.next()
            b = int(self.expect("int").text)
            self.expect("op", "]")
            # reference semantics: [1..3] == [1, 2] (stop-exclusive,
            # tests/test_basic.py:631-638)
            return self.engine.range(a, b)
        vals = []
        while not self.accept("op", "]"):
            v = self.atom()
            vals.append(v)
            self.accept("op", ",")
        return self.engine.list_(vals)

    def _name(self, name: str):
        # resolution order: current-table column → env → catalog table
        # → builtin function name (returned as marker for _call)
        if self.table is not None and name in self.table.df.columns:
            return self.table.df[name]
        if self.table is not None and self.table.meta.methods \
                and name in self.table.meta.methods:
            return self.table.meta.methods[name](self.table)
        if name in self.env:
            return self.env[name]
        if name in self.engine.tables():
            return self.engine.table(name)
        if name in _FUNCTIONS or name in _TABLE_FUNCS:
            return _FuncRef(name)
        raise NameError(f"unknown name {name!r}")

    def _attr(self, v, name: str):
        if isinstance(v, _JoinAlias):
            if name not in v.table.df.columns:
                raise AttributeError(
                    f"table {v.name!r} has no column {name!r}")
            return F.col(f"{v.name}.{name}")
        if isinstance(v, Table):
            return v[name]
        if isinstance(v, Column):
            # struct field or timestamp property
            from preql_spark.functions import scalar as s
            props = {"hour": s.dt_hour, "minute": s.dt_minute, "day": s.dt_day,
                     "month": s.dt_month, "year": s.dt_year,
                     "day_of_week": s.dt_day_of_week,
                     "week_of_year": s.dt_week_of_year}
            if name in props:
                return props[name](v)
            return v.getField(name)
        raise TypeError(f"cannot access .{name} on {type(v)}")

    def _call(self, fn):
        args, kwargs = [], {}
        # join-family calls bind their table kwargs into the env as
        # they are parsed, so a later `on:` condition can reference the
        # aliases — the reference's `$on` lazy parameter
        # (evaluate.py:597; test_basic.py:1510-1525)
        join_scope = isinstance(fn, _FuncRef) and fn.name in (
            "join", "leftjoin", "outerjoin", "joinall")
        shadowed: dict[str, object] = {}
        while not self.accept("op", ")"):
            if self.peek().kind == "name" and self.peek(1).kind == "op" \
                    and self.peek(1).text == ":":
                k = self.next().text
                self.next()
                kwargs[k] = self.expr()
                if join_scope and isinstance(kwargs[k], Table):
                    if k in self.env:
                        shadowed[k] = self.env[k]
                    # alias proxy: `a.col` inside `on:` becomes the
                    # qualified F.col("a.col"), which resolves against
                    # the frames join() aliases by kwarg name — and
                    # stays unambiguous for self-joins
                    self.env[k] = _JoinAlias(k, kwargs[k])
            else:
                args.append(self.expr())
            self.accept("op", ",")
        if join_scope:
            for k, v in kwargs.items():
                if isinstance(v, Table) and k not in shadowed:
                    self.env.pop(k, None)
            self.env.update(shadowed)
        if isinstance(fn, _FuncRef):
            return _apply_function(self, fn.name, args, kwargs)
        if isinstance(fn, _UserFunc):
            return self._inline_call(fn, args, kwargs)
        raise TypeError(f"{fn!r} is not callable")

    def _inline_call(self, fn: "_UserFunc", args, kwargs):
        """Inline a user function: re-parse the captured body with
        parameters bound to the (already-evaluated) argument values —
        Columns compose into the caller's expression, Tables flow
        through relational ops.  No spark.udf anywhere."""
        if len(args) > len(fn.params):
            raise TypeError(f"{fn.name}() takes {len(fn.params)} args")
        binding = dict(zip(fn.params, args))
        for k, v in kwargs.items():
            if k not in fn.params:
                raise TypeError(f"{fn.name}() has no parameter {k!r}")
            binding[k] = v
        missing = [p for p in fn.params if p not in binding]
        if missing:
            raise TypeError(f"{fn.name}() missing arguments: {missing}")
        sub = Parser(self.engine, "", {**self.env, **binding})
        sub.toks = fn.body
        sub.table = self.table
        sub.in_agg = self.in_agg
        v = sub.expr()
        sub.expect("eof")
        return v

    # ---- coercion --------------------------------------------------
    def _is_stringy(self, x) -> bool:
        """Best-effort static stringiness for operator dispatch
        (compile_binops.py:246-259 dispatches ``+``/``*`` on the
        Preql type): Python str literals, and bare current-table
        columns whose schema dtype is string."""
        if isinstance(x, str):
            return True
        if isinstance(x, Column) and self.table is not None:
            name = str(x)
            if name.startswith("Column<'") and name.endswith("'>"):
                name = name[8:-2]
                dt = dict(self.table.df.dtypes).get(name)
                return dt == "string"
        return False

    def _col(self, v) -> Column:
        if isinstance(v, Column):
            return v
        if isinstance(v, Table):
            # 1-column table used as a scalar/vector — take its column
            if len(v.df.columns) == 1:
                return v.df[v.df.columns[0]]
            raise TypeError("cannot use multi-column table as a value")
        return F.lit(v)


@dataclass
class _FuncRef:
    name: str


@dataclass
class _JoinAlias:
    """Join-scope binding for `on:` conditions (`$on` parity)."""
    name: str
    table: "Table"


@dataclass
class _UserFunc:
    """``func f(x) = body`` — body kept as an unevaluated token span,
    inlined at each call site (reference: UserFunction,
    pql_objects.py:216-236 + eval_func_call, evaluate.py:579-648)."""
    name: str
    params: list
    body: list


def _plain_col_name(c: Column) -> str | None:
    """Name if the column is a trivial attribute reference."""
    s = str(c)
    m = re.fullmatch(r"Column<'(\w+)'>", s)
    return m.group(1) if m else None


# Aggregate / scalar builtins (dual-mode like the reference stdlib:
# whole-table when called on a table, in-group when inside `=> ...`).
def _agg_or_table(parser: Parser, fcol, fall):
    def apply(args):
        v = args[0] if args else None
        if isinstance(v, Table):
            return fall(v)
        return fcol(parser._col(v) if v is not None else None)
    return apply


def _apply_function(parser: Parser, name: str, args, kwargs):
    from preql_spark.functions import aggregate as agg
    from preql_spark import table as tbl

    if name == "fmt":
        # fmt("$var text") interpolation (pql_functions.py:132-169):
        # $names resolve in the current evaluation context and the
        # template compiles to one concat expression
        template = args[0]
        if not isinstance(template, str):
            raise TypeError("fmt() takes a string literal")
        parts, pos = [], 0
        for m in re.finditer(r"\$(\w+)", template):
            if m.start() > pos:
                parts.append(F.lit(template[pos:m.start()]))
            parts.append(parser._col(parser._name(m.group(1)))
                         .cast("string"))
            pos = m.end()
        if pos < len(template):
            parts.append(F.lit(template[pos:]))
        return F.concat(*parts) if parts else F.lit("")

    if name in _TABLE_FUNCS:
        if name in ("join", "leftjoin", "outerjoin", "joinall"):
            tables = {k: v for k, v in kwargs.items() if isinstance(v, Table)}
            on = kwargs.get("on")
            f = {"join": tbl.join, "leftjoin": tbl.leftjoin,
                 "outerjoin": tbl.outerjoin}.get(name)
            if name == "joinall":
                return tbl.joinall(**tables)
            return f(on=on, **tables)
        if name == "distinct":
            return args[0].distinct()
        if name == "enum":
            return args[0].enum()
        if name == "describe":
            return args[0].describe()
        if name == "limit":
            return args[0].limit(args[1])
        if name == "temptable":
            return args[0].cache()
        if name == "one":
            return args[0].one()
        if name == "page":
            return args[0].page(args[1], args[2])
        if name == "is_empty":
            return args[0].is_empty()
        if name == "sample_ratio_fast":
            return args[0].sample_ratio(args[1])
        if name == "sample_fast":
            return args[0].sample_n(args[1])
        if name == "limit_offset":
            return args[0].slice(args[2], args[2] + args[1])

    col = None
    if args and isinstance(args[0], Table):
        t = args[0]
        if name == "count":
            return t.count()
        if len(t.df.columns) != 1:
            raise TypeError(f"{name}() on multi-column table")
        # whole-table aggregate → scalar via a 1-row frame
        c = t.df[t.df.columns[0]]
        out = t.df.agg(_AGG_MAP[name](c).alias("value")).collect()[0].value
        return out
    if args:
        col = parser._col(args[0])
    if name == "count":
        return F.count(F.lit(1)) if col is None else agg.count(col)
    if name in _AGG_MAP:
        return _AGG_MAP[name](col)
    if name in _SCALAR_MAP:
        return _SCALAR_MAP[name](*[parser._col(a) if isinstance(a, Column)
                                   else a for a in args])
    raise NameError(f"unknown function {name!r}")


def _make_maps():
    from preql_spark.functions import aggregate as agg
    from preql_spark.functions import scalar as s
    agg_map = {
        "sum": agg.sum_, "mean": agg.mean, "avg": agg.mean,
        "min": agg.min_, "max": agg.max_, "stddev": agg.stddev,
        "first": agg.first, "first_or_null": agg.first_or_null,
        "count_distinct": agg.count_distinct,
        "count_true": agg.count_true, "count_false": agg.count_false,
        "median": agg.median, "product": agg.product,
        "approx_product": agg.approx_product,
        "approx_count_distinct": agg.approx_count_distinct,
    }
    scalar_map = {
        "lower": s.lower, "upper": s.upper, "length": s.length,
        "repeat": lambda c, n: s.repeat(c, n),
        "char": s.char, "char_ord": s.char_ord,
        "round": lambda c, p=0: s.round_(c, p if isinstance(p, int) else 0),
        "str_contains": lambda sub, c: s.str_contains(sub, c),
        "str_index": lambda sub, c: s.str_index(sub, c),
        "int": s.to_int, "float": s.to_float, "string": s.to_string,
        "bool": s.to_bool, "now": lambda: s.now(), "random": lambda: s.random(),
        "char_range": s.char_range,
        "str_notcontains": lambda sub, c: s.str_notcontains(sub, c),
        "pi": lambda: F.lit(__import__("math").pi),
    }
    return agg_map, scalar_map


_AGG_MAP, _SCALAR_MAP = _make_maps()
_FUNCTIONS = set(_AGG_MAP) | set(_SCALAR_MAP) | {"count", "fmt"}
_TABLE_FUNCS = {"join", "leftjoin", "outerjoin", "joinall", "distinct",
                "enum", "describe", "limit", "temptable", "one",
                "page", "is_empty", "sample_ratio_fast", "sample_fast",
                "limit_offset"}


def q(engine, src: str, **env):
    """Compile and evaluate a Preql-syntax query against the engine's
    catalog.  Returns a Table, Column, or Python scalar."""
    return Parser(engine, src, env).parse()
