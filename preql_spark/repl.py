"""Interactive REPL — the engine analogue of the reference's
``preql`` console (preql/repl.py; §2.13 of SURVEY.md).

Kept deliberately small and dependency-free: readline history and
bracket-aware multi-line continuation, Preql-syntax evaluation through
:meth:`Engine.q`, table preview printing with ``.``-paging (type ``.``
on its own line for the next page — reference repl.py table preview),
in-language ``names()`` / ``help()`` / ``tables()`` for discovery, and
context-aware tab completion via :mod:`preql_spark.autocomplete` (the
engine analogue of the reference's partial-compile suggestion harvest,
preql/core/autocomplete.py).

Run:  python -m preql_spark [data_dir]
"""

from __future__ import annotations

import sys

PAGE = 20

_BANNER = """preql-spark interactive console
Type 'names()' to list the namespace, 'help()' for help, Ctrl-D to exit.
"""


def _balanced(src: str) -> bool:
    depth = 0
    in_str: str | None = None
    for ch in src:
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "\"'":
            in_str = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
    return depth <= 0 and in_str is None


class Repl:
    def __init__(self, engine):
        self.engine = engine
        # paging state: last previewed table + current offset
        self._last = None
        self._offset = 0

    # ---- output ----------------------------------------------------
    def _print_table(self, t, offset: int = 0) -> None:
        from preql_spark.table import Table
        assert isinstance(t, Table)
        page = t.df.offset(offset).limit(PAGE) if offset else t.df.limit(PAGE)
        rows = page.collect()
        if not rows:
            print("(no more rows)" if offset else "(empty table)")
            return
        cols = page.columns
        widths = [max(len(c), *(len(str(r[c])) for r in rows)) for c in cols]
        line = "  ".join(c.ljust(w) for c, w in zip(cols, widths))
        print(line)
        print("-" * len(line))
        for r in rows:
            print("  ".join(str(r[c]).ljust(w) for c, w in zip(cols, widths)))
        if len(rows) == PAGE:
            print(f"... type '.' for more (rows {offset}..{offset + PAGE})")

    def show(self, value) -> None:
        from pyspark.sql import Column, Row
        from preql_spark.table import Table
        if value is None:
            return
        if isinstance(value, Table):
            self._last, self._offset = value, PAGE
            self._print_table(value)
        elif isinstance(value, Row):
            print(dict(value.asDict()))
        elif isinstance(value, Column):
            print(value)
        elif isinstance(value, bool):
            print("true" if value else "false")
        else:
            print(value)

    # ---- loop ------------------------------------------------------
    def run_line(self, src: str) -> None:
        if src.strip() == ".":
            if self._last is None:
                print("(no table to page)")
                return
            self._print_table(self._last, self._offset)
            self._offset += PAGE
            return
        try:
            v = self.engine.q(src)
            # --print-plan / set_setting("print_plan", true): the
            # reference's --print-sql analogue — show the physical
            # plan that will execute before the result
            from preql_spark import display as _display
            if getattr(_display, "PRINT_PLAN", False) \
                    and hasattr(v, "inspect_plan"):
                print(v.inspect_plan("simple"))
            self.show(v)
        except (Exception,) as e:          # surface, don't die
            print(f"{type(e).__name__}: {e}", file=sys.stderr)

    def interact(self, prompt: str = "preql> ",
                 exit_commands: tuple = ()) -> None:
        """Run the REPL loop.  ``exit_commands`` names commands that
        END this loop — the reference's breakpoint sub-REPL registers
        ``c`` / ``continue`` (pql_functions.py:831-833, the
        ``breakpoint_funcs`` scope), accepted bare or with ``()``."""
        buf: list[str] = []
        try:
            import readline  # noqa: F401  (history + line editing)
            from preql_spark.autocomplete import make_completer
            readline.set_completer(make_completer(self.engine, buf))
            # '.' is a delimiter so `tbl.<TAB>` completes the attribute
            readline.set_completer_delims(
                " \t\n`~!@#$%^&*()-=+[{]}\\|;:'\",<>/?.")
            readline.parse_and_bind("tab: complete")
        except ImportError:
            pass
        print(_BANNER)
        while True:
            p = "   ... " if buf else prompt
            try:
                line = input(p)
            except EOFError:
                print()
                return
            except KeyboardInterrupt:
                print("^C")
                buf.clear()
                continue
            if not buf and exit_commands \
                    and line.strip().rstrip("()") in exit_commands:
                return                   # continue the outer program
            buf.append(line)
            src = "\n".join(buf)
            if not src.strip():
                buf.clear()
                continue
            if _balanced(src):
                buf.clear()
                self.run_line(src)


def main(argv: list[str] | None = None) -> None:
    """CLI with the reference's argument surface
    (/root/reference/preql/__main__.py): -f/--file runs a script,
    -m/--module runs `<module>.pql` from the working directory,
    -i/--interactive enters the REPL after a script, --version prints
    the version, --time reports script wall time, and a `.preql`
    dotfile found in the cwd or any parent is auto-run before an
    interactive session.  The positional argument is the data
    directory (the engine's analogue of the reference's database
    URL)."""
    import argparse
    import time
    from pathlib import Path

    p = argparse.ArgumentParser(
        prog="preql_spark",
        description="preql_spark command-line interface (aka REPL)")
    p.add_argument("-i", "--interactive", action="store_true",
                   help="enter interactive mode after running the script")
    p.add_argument("-v", "--version", action="store_true",
                   help="print version")
    p.add_argument("-f", "--file", type=str,
                   help="path to a Preql script to run")
    p.add_argument("-m", "--module", type=str,
                   help="name of a Preql module to run (<module>.pql)")
    p.add_argument("--time", action="store_true",
                   help="displays how long the script ran")
    p.add_argument("--print-plan", action="store_true",
                   help="print the physical plan before each result "
                        "(the reference's --print-sql)")
    p.add_argument("data_dir", type=str, nargs="?", default=None,
                   help="directory of parquet tables to load")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    if args.version:
        from preql_spark import __version__
        print(__version__)
        if not (args.file or args.module or args.interactive):
            return

    if args.print_plan:
        from preql_spark import display as _display
        _display.PRINT_PLAN = True

    from preql_spark import connect
    eng = connect(data_dir=args.data_dir) if args.data_dir else connect()

    script = None
    if args.file:
        script = Path(args.file)
    elif args.module:
        script = Path(f"{args.module}.pql")
    if script is not None:
        t0 = time.perf_counter()
        eng.q(script.read_text())
        if args.time:
            print(f"script took {time.perf_counter() - t0:.3f}s")
        if not args.interactive:
            return
    elif script is None and not args.file:
        # reference find_dot_preql: a `.preql` file in the cwd or any
        # parent runs before the interactive session
        for d in [Path.cwd(), *Path.cwd().parents]:
            dot = d / ".preql"
            if dot.exists():
                eng.q(dot.read_text())
                break
    Repl(eng).interact()


if __name__ == "__main__":
    main()
