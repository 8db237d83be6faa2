"""Context-aware autocomplete over the lang front-end (§2.13).

Reference behavior: ``preql/core/autocomplete.py:1-223`` — the
reference runs its Lark compiler in a partial mode, feeds a MARKER
token through the interactive parser to complete the parse, evaluates
the statements with an unknown-tolerant state, and harvests a
``name -> (rank, value)`` suggestion dict; driven positionally by
``tests/test_autocomplete.py``.

This implementation re-derives the same suggestion surface on top of
the hand-written recursive-descent parser (`preql_spark.lang`):

- complete leading statements are *scope-evaluated* into a scratch
  environment (bindings only — DDL creates schema-level pseudo tables
  and DML is never executed, mirroring the reference's
  ``eval_autocomplete`` which replaces function bodies with ``return
  unknown`` and skips inserts);
- the incomplete tail is analyzed structurally: an unclosed ``{`` /
  ``[`` with a table-valued subject suggests that table's columns, a
  trailing ``.`` suggests attribute/struct fields, statement-keyword
  heads (``func``/``for``/``catch``/...) bind their header names and
  recurse into their open blocks, and everything else falls back to
  names in scope + builtins + keywords.

Ranks follow the reference (autocomplete.py:163-183): keywords
100000, builtins 10000, locals/tables 1000, columns 100 — lower rank
sorts first in a completer UI.  Values are ``(rank, value-or-None)``
tuples like the reference's ``get_all_vars_with_rank``.

Everything here is driver-side string/metadata work; the only Spark
touched is lazy plan construction (and the parser's one-row scalar
localization), so completion stays interactive even against a 100 TB
catalog — schemas come from DataFrame metadata, never data.
"""

from __future__ import annotations

from preql_spark.lang import (_FUNCTIONS, _KEYWORDS, _TABLE_FUNCS,
                              _TYPE_NAMES, Tok, tokenize)

KEYWORD_RANK = 100000
BUILTIN_RANK = 10000
LOCAL_RANK = 1000
COLUMN_RANK = 100

# statement keywords whose head token owns the rest of the segment
_EXPR_HEADS = {"print", "assert", "return", "throw", "one"}
_BLOCK_KWS = {"if", "while", "for", "catch", "else", "try",
              "transaction"}

# Spark DDL type for a lang column-type name (table-def pseudo tables)
_DDL_TYPES = {"int": "long", "float": "double", "string": "string",
              "text": "string", "bool": "boolean",
              "timestamp": "timestamp", "number": "double"}


class _FuncSuggestion:
    """Placeholder bound for a user function name: suggests the name
    without making the (unevaluated) function callable — the analogue
    of the reference's body-replaced-with-``return unknown``."""

    def __init__(self, name: str, params: list[str]):
        self.name, self.params = name, params

    def __repr__(self):
        return f"<func {self.name}({', '.join(self.params)})>"


def autocomplete(engine, code: str, env: dict | None = None
                 ) -> dict[str, tuple[int, object]]:
    """Suggestions for the cursor at the end of ``code`` — a dict
    ``name -> (rank, value-or-None)`` like the reference
    ``autocomplete(state, code)``."""
    try:
        toks = tokenize(code)[:-1]          # drop eof
    except SyntaxError:
        return {}                           # reference: UnexpectedCharacters
    scope: dict = {}
    for t in getattr(engine, "tables", lambda: [])():
        scope[t] = None                     # catalog names (values lazy)
    for t in getattr(engine, "mutables", {}):
        scope[t] = None
    scope.update(engine.lang_env if env is None else env)
    try:
        return _suggest_block(engine, toks, scope)
    except Exception:                       # never break the REPL
        return {}


# ---- statement sequence ---------------------------------------------

def _split(toks: list[Tok]) -> list[list[Tok]]:
    """Split at depth-0 newlines/semicolons; the last element is the
    (possibly incomplete, possibly empty) tail segment."""
    out: list[list[Tok]] = []
    cur: list[Tok] = []
    depth = 0
    for t in toks:
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth = max(0, depth - 1)
        if depth == 0 and (t.kind == "nl" or
                           (t.kind == "op" and t.text == ";")):
            out.append(cur)
            cur = []
            continue
        # newlines INSIDE brackets are kept: when a block brace is
        # later entered recursively they become depth-0 separators
        cur.append(t)
    out.append(cur)
    return out


def _suggest_block(engine, toks: list[Tok], scope: dict) -> dict:
    segments = _split(toks)
    for seg in segments[:-1]:
        _bind(engine, seg, scope)
    last = segments[-1]
    if not last:
        return _general(engine, scope)
    if _is_complete(last):
        _bind(engine, last, scope)
        return _general(engine, scope)
    return _segment_context(engine, last, scope)


_CONTINUATION_KWS = {"and", "or", "not", "in", "if", "else", "order",
                     "new", "one", "func", "table", "print", "assert",
                     "return", "throw", "while", "for", "try", "catch",
                     "const", "bare", "update", "delete", "transaction"}


def _is_complete(seg: list[Tok]) -> bool:
    depth = 0
    for t in seg:
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth = max(0, depth - 1)
    if depth:
        return False
    last = seg[-1]
    if last.kind == "op" and last.text not in ")]}":
        return False
    if last.kind in _CONTINUATION_KWS or last.kind == "dots":
        return False
    return True


# ---- binding complete statements ------------------------------------

def _bind(engine, seg: list[Tok], scope: dict) -> None:
    if not seg:
        return
    i = 0
    if seg[i].kind in ("const", "bare") and len(seg) > 1 \
            and seg[1].kind == "table":
        i = 1
    k = seg[i].kind
    if k == "func":
        name, params, _, _ = _func_header(seg[i:])
        if name:
            scope[name] = _FuncSuggestion(name, params)
        return
    if k == "table":
        rest = seg[i + 1:]
        if not rest or rest[0].kind != "name":
            return
        name = rest[0].text
        if len(rest) > 1 and rest[1].kind == "op" and rest[1].text == "=":
            scope[name] = _bind_value(engine, name, rest[2:], scope)
        else:
            cols = _tabledef_cols(rest[1:])
            scope[name] = _pseudo_table(engine, name, cols)
        return
    if k == "name" and len(seg) > 1 and seg[1].kind == "op" \
            and seg[1].text == "=":
        scope[seg[0].text] = _bind_value(engine, seg[0].text,
                                         seg[2:], scope)
        return
    # for/while/if/try bodies are their own scope; print/assert/DML
    # bind nothing — same as reference eval_autocomplete dispatch


def _bind_value(engine, name: str, rhs: list[Tok], scope: dict):
    """Evaluate an assignment RHS for the scratch scope.  When a
    join-family RHS cannot be evaluated (unknown inputs), recover its
    output columns from the kwarg names so selections/projections over
    the binding still suggest them — the reference's UnknownInstance
    propagation (test_autocomplete.py test_progressive2)."""
    rhs = [t for t in rhs if t.kind != "nl"] or rhs
    val = _safe_eval(engine, rhs, scope)
    if val is None:
        cols = _join_kwarg_columns(rhs)
        if cols:
            return _pseudo_table(engine, name,
                                 [(c, "string") for c in cols])
    return val


def _func_header(seg: list[Tok]):
    """``func NAME ( params )`` → (name, params, index-after-header,
    '=' | '{' | None form marker)."""
    name = seg[1].text if len(seg) > 1 and seg[1].kind == "name" else None
    params: list[str] = []
    j = 2
    if j < len(seg) and seg[j].kind == "op" and seg[j].text == "(":
        depth = 1
        j += 1
        expecting = True
        while j < len(seg) and depth:
            t = seg[j]
            if t.kind == "op" and t.text in "([{":
                depth += 1
            elif t.kind == "op" and t.text in ")]}":
                depth -= 1
            elif depth == 1 and t.kind == "name" and expecting:
                params.append(t.text)
                expecting = False
            elif depth == 1 and t.kind == "op" and t.text == ",":
                expecting = True
            j += 1
    form = None
    if j < len(seg) and seg[j].kind == "op" and seg[j].text in ("=", "{"):
        form = seg[j].text
    return name, params, j, form


def _tabledef_cols(toks: list[Tok]) -> list[tuple[str, str]]:
    """Column (name, lang-type) pairs declared inside ``{...}`` of a
    table definition (complete or cut off)."""
    cols: list[tuple[str, str]] = []
    depth = 0
    for i, t in enumerate(toks):
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth -= 1
        elif depth == 1 and t.kind == "op" and t.text == ":" and i \
                and toks[i - 1].kind == "name":
            ty = toks[i + 1].text if i + 1 < len(toks) \
                and toks[i + 1].kind == "name" else "string"
            cols.append((toks[i - 1].text, ty))
    return cols


def _pseudo_table(engine, name: str, cols: list[tuple[str, str]]):
    """Schema-level stand-in for ``table X {...}`` — a real (empty)
    Table so downstream expressions resolve columns, but no mutable
    storage is created (the reference binds ``sql.unknown``)."""
    try:
        from preql_spark.engine import TableMeta
        from preql_spark.table import Table
        ddl = ", ".join(["id long"] +
                        [f"{c} {_DDL_TYPES.get(ty, 'string')}"
                         for c, ty in cols])
        df = engine.spark.createDataFrame([], ddl)
        return Table(engine, df, meta=TableMeta(name, pk="id"))
    except Exception:
        return None


# ---- the incomplete tail --------------------------------------------

def _segment_context(engine, seg: list[Tok], scope: dict) -> dict:
    i = 0
    if seg[i].kind in ("const", "bare") and len(seg) > 1 \
            and seg[1].kind == "table":
        i = 1
    k = seg[i].kind

    # assignment: context is the right-hand side
    if k == "name" and len(seg) > i + 1 and seg[i + 1].kind == "op" \
            and seg[i + 1].text in ("=", "+="):
        return _expr_context(engine, seg[i + 2:], scope)

    if k in _EXPR_HEADS:
        return _expr_context(engine, seg[i + 1:], scope)

    if k == "table":
        rest = seg[i + 1:]
        if len(rest) > 1 and rest[1].kind == "op" and rest[1].text == "=":
            return _expr_context(engine, rest[2:], scope)
        if rest and rest[0].kind == "name":
            scope[rest[0].text] = _pseudo_table(
                engine, rest[0].text, _tabledef_cols(rest[1:]))
        return _general(engine, scope)

    # open nested block?  (func body, control flow, catch, ...)
    block_idx = _open_block_brace(seg)
    if block_idx is not None:
        child = dict(scope)
        _harvest_bindings(engine, seg[:block_idx], child)
        return _suggest_block(engine, seg[block_idx + 1:], child)

    if k == "func":
        # expression form ``func f(a, b) = expr`` still in flight
        name, params, j, form = _func_header(seg[i:])
        child = dict(scope)
        for p in params:
            child.setdefault(p, None)
        if name:
            child[name] = _FuncSuggestion(name, params)
        if form == "=":
            return _expr_context(engine, seg[i + j + 1:], child)
        return _general(engine, child)

    if k == "for":
        child = dict(scope)
        _harvest_bindings(engine, seg, child)
        # inside the iterable expression: `for (i in <expr...`
        for j in range(len(seg) - 1, -1, -1):
            if seg[j].kind == "in":
                return _expr_context(engine, seg[j + 1:], child)
        return _general(engine, child)

    if k in _BLOCK_KWS:
        child = dict(scope)
        _harvest_bindings(engine, seg, child)
        return _expr_context(engine, seg[i + 1:], child)

    return _expr_context(engine, seg[i:], scope)


def _open_block_brace(seg: list[Tok]) -> int | None:
    """Index of the innermost unclosed ``{`` that opens a statement
    BLOCK (func body / control flow), or None.  Projection braces
    (table-valued subject) are left for _expr_context."""
    stack: list[int] = []
    for idx, t in enumerate(seg):
        if t.kind == "op" and t.text in "([{":
            stack.append(idx)
        elif t.kind == "op" and t.text in ")]}":
            if stack:
                stack.pop()
    for idx in reversed(stack):
        if seg[idx].text != "{":
            continue
        if _is_block_brace(seg, idx):
            return idx
    return None


def _is_block_brace(seg: list[Tok], idx: int) -> bool:
    i = idx - 1
    if i < 0:
        return True
    t = seg[i]
    if t.kind in ("try", "else", "transaction"):
        return True
    if t.kind == "op" and t.text == ")":
        # walk back over the balanced paren group
        depth = 1
        i -= 1
        while i >= 0 and depth:
            if seg[i].kind == "op" and seg[i].text in ")]}":
                depth += 1
            elif seg[i].kind == "op" and seg[i].text in "([{":
                depth -= 1
            i -= 1
        if i >= 0 and seg[i].kind in ("if", "while", "for", "catch"):
            return True
        # func NAME ( ... ) {
        if i >= 1 and seg[i].kind == "name" and seg[i - 1].kind == "func":
            return True
        return False                        # call result → projection
    return False


def _harvest_bindings(engine, toks: list[Tok], scope: dict) -> None:
    """Bind names declared by statement headers in ``toks``: func
    names + params, ``catch (e ...)`` vars, ``for (i in ...)`` vars."""
    for i, t in enumerate(toks):
        if t.kind == "func":
            name, params, _, _ = _func_header(toks[i:])
            if name:
                scope[name] = _FuncSuggestion(name, params)
            for p in params:
                scope.setdefault(p, None)
        elif t.kind in ("catch", "for") and i + 2 < len(toks) \
                and toks[i + 1].kind == "op" and toks[i + 1].text == "(" \
                and toks[i + 2].kind == "name":
            scope.setdefault(toks[i + 2].text, None)


def _expr_context(engine, seg: list[Tok], scope: dict) -> dict:
    if not seg:
        return _general(engine, scope)
    # the trailing identifier is the word being typed — context is as
    # of just before it
    if seg[-1].kind == "name":
        seg = seg[:-1]
        if not seg:
            return _general(engine, scope)

    # unclosed-bracket stack with subjects
    stack: list[int] = []
    for idx, t in enumerate(seg):
        if t.kind == "op" and t.text in "([{":
            stack.append(idx)
        elif t.kind == "op" and t.text in ")]}":
            if stack:
                stack.pop()

    # trailing '.' → attribute/struct-field suggestions
    if seg[-1].kind == "op" and seg[-1].text == ".":
        prim = _primary_before(seg, len(seg) - 1)
        if not prim:
            return {}                       # reference: `{.` → {}
        fields = _attr_fields(engine, prim, seg, stack, scope)
        if fields is None:
            return {}
        return {f: (COLUMN_RANK, None) for f in fields}

    for idx in reversed(stack):
        ch = seg[idx].text
        if ch == "(":
            continue                        # plain grouping/call args
        prim = _primary_before(seg, idx)
        cols = _eval_columns(engine, prim, scope)
        if cols:
            out = _general(engine, scope)
            out.update({c: (COLUMN_RANK, None) for c in cols})
            return out
    return _general(engine, scope)


def _primary_before(seg: list[Tok], idx: int) -> list[Tok] | None:
    """The primary-expression token span immediately preceding
    ``seg[idx]`` (a bracket or dot): a chain of names / literals /
    balanced groups / ``.`` / ``order``."""
    j = idx
    i = idx - 1
    while i >= 0:
        t = seg[i]
        if t.kind == "op" and t.text in ")]}":
            depth = 1
            i -= 1
            while i >= 0 and depth:
                if seg[i].kind == "op" and seg[i].text in ")]}":
                    depth += 1
                elif seg[i].kind == "op" and seg[i].text in "([{":
                    depth -= 1
                i -= 1
            continue
        if t.kind in ("name", "int", "float", "string", "sname",
                      "order") or (t.kind == "op" and t.text == "."):
            i -= 1
            continue
        break
    start = i + 1
    prim = seg[start:j]
    # a dangling operator keyword before the bracket (`x order {`) is
    # part of the chain but not of the evaluable subject
    while prim and prim[-1].kind == "order":
        prim = prim[:-1]
    return prim or None


_JOIN_FAMILY = {"join", "leftjoin", "outerjoin", "joinall"}


def _eval_columns(engine, prim: list[Tok] | None, scope: dict
                  ) -> list[str] | None:
    if not prim:
        return None
    val = _safe_eval(engine, prim, scope)
    from preql_spark.table import Table
    if isinstance(val, Table):
        cols = list(val.df.columns)
        meta = getattr(val, "meta", None)
        if meta is not None:
            cols += list(getattr(meta, "methods", {}) or {})
        return cols
    return _join_kwarg_columns(prim)


def _join_kwarg_columns(prim: list[Tok]) -> list[str] | None:
    """Column names of a join-family call that could NOT be evaluated
    (unknown inputs — the reference's UnknownInstance propagation):
    the output struct columns ARE the kwarg names, recoverable
    syntactically.  `leftjoin(l: logins.item, u: User.login)` suggests
    l and u even when logins/User are unresolvable (reference
    tests/test_autocomplete.py test_progressive2)."""
    if len(prim) < 2 or prim[0].kind != "name" \
            or prim[0].text not in _JOIN_FAMILY \
            or prim[1].kind != "op" or prim[1].text != "(":
        return None
    names, depth = [], 0
    for i, t in enumerate(prim[1:], start=1):
        if t.kind == "op" and t.text in "([{":
            depth += 1
        elif t.kind == "op" and t.text in ")]}":
            depth -= 1
        elif depth == 1 and t.kind == "op" and t.text == ":" \
                and prim[i - 1].kind == "name" \
                and prim[i - 1].text != "on":
            names.append(prim[i - 1].text)
    return names or None


def _attr_fields(engine, prim: list[Tok], seg: list[Tok],
                 stack: list[int], scope: dict) -> list[str] | None:
    """Fields reachable after ``<prim>.`` — struct columns of an
    enclosing projection subject first (``{n.`` inside a join
    projection), then any table-valued evaluation of the primary."""
    from pyspark.sql.types import StructType
    from preql_spark.table import Table
    if len(prim) == 1 and prim[0].kind == "name":
        name = prim[0].text
        for idx in reversed(stack):
            if seg[idx].text not in "{[":
                continue
            subject = _primary_before(seg, idx)
            t = _safe_eval(engine, subject, scope) if subject else None
            if isinstance(t, Table) and name in t.df.columns:
                dt = t.df.schema[name].dataType
                if isinstance(dt, StructType):
                    return dt.fieldNames()
                return None
    cols = _eval_columns(engine, prim, scope)
    return cols


def _safe_eval(engine, toks: list[Tok], scope: dict):
    """Evaluate an expression span with the real Parser against a
    scratch env.  Never raises; never executes side effects (DML
    keywords bail out first — the reference likewise skips inserts in
    eval_autocomplete)."""
    if not toks or any(t.kind in ("new", "update", "delete")
                       for t in toks):
        return None
    src = " ".join(t.text for t in toks)
    env = {k: v for k, v in scope.items()
           if v is not None and not isinstance(v, _FuncSuggestion)}
    try:
        from preql_spark.lang import Parser
        return Parser(engine, src, env).parse()
    except Exception:
        return None


# ---- the suggestion sets --------------------------------------------

def _general(engine, scope: dict) -> dict:
    out: dict[str, tuple[int, object]] = {}
    for b in _FUNCTIONS | _TABLE_FUNCS | _TYPE_NAMES:
        out[b] = (BUILTIN_RANK, None)
    for kw in _KEYWORDS:                   # reference updates keywords
        out[kw] = (KEYWORD_RANK, None)     # last (autocomplete.py:183)
    for t in getattr(engine, "tables", lambda: [])():
        out[t] = (LOCAL_RANK, None)
    for k, v in scope.items():
        out[k] = (LOCAL_RANK, v)
    return out


# ---- readline completer (REPL wiring) -------------------------------

def make_completer(engine, pending_lines=None):
    """A ``readline``-style completer closed over the engine: complete
    the word at the cursor from :func:`autocomplete` of everything
    before it (multi-line input supported via ``pending_lines``, a
    mutable list of the buffered lines)."""
    state = {"matches": []}

    def complete(text: str, n: int):
        if n == 0:
            try:
                import readline
                line = readline.get_line_buffer()[:readline.get_endidx()]
            except Exception:
                line = text
            prefix = line[:len(line) - len(text)] if text else line
            code = "\n".join(list(pending_lines or []) + [prefix])
            names = autocomplete(engine, code)
            state["matches"] = sorted(
                (name for name in names if name.startswith(text)),
                key=lambda s: (names[s][0], s))
        return state["matches"][n] if n < len(state["matches"]) else None

    return complete
