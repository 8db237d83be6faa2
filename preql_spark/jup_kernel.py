"""Jupyter kernel for the preql_spark language.

Reference parity: ``preql/jup_kernel/`` (kernel.py: ``PreqlKernel`` on
``ipykernel.kernelbase.Kernel`` with html ``do_execute`` and
autocomplete-backed ``do_complete``).  The same two capabilities here,
re-derived for this engine:

- :func:`execute_to_html` — run one cell through the lang, render the
  result (tables as the bounded html preview, scalars via repr), and
  report success; Signals render as error html instead of raising.
- :func:`complete_at` — cursor completion built on
  :mod:`preql_spark.autocomplete` with the reference's last-word
  splitter (kernel.py ``last_word``, including the ``!`` prefix hack
  for ``!in`` / ``{... !col}``).

``PreqlSparkKernel`` wires those into the ipykernel base class when
ipykernel is installed (it is not in this container, so the class is
constructed lazily via :func:`make_kernel_class`; the two capability
functions are dependency-free and fully tested).  Install with
``python -m preql_spark.jup_kernel install`` (writes the kernelspec),
launch with ``python -m preql_spark.jup_kernel``.

Driver-side only by design: a kernel is an interactive front-end; the
heavy lifting stays in the Spark plans the cells build.
"""

from __future__ import annotations

import json
import os
import sys

__version__ = "0.1"


# ---- capability core (dependency-free, tested) -----------------------------

def _is_name(s: str) -> bool:
    return s.isalnum() or s in ("_", "!")


def last_word(s: str) -> tuple[str, str]:
    """Split ``s`` into (context, trailing-name-fragment) — the
    reference's kernel.py ``last_word``, `!` hack included."""
    if not s:
        return "", ""
    i = len(s)
    while i and _is_name(s[i - 1]):
        i -= 1
    if i < len(s) and s[i] == "!":
        i += 1
    return s[:i], s[i:]


def execute_to_html(engine, code: str) -> dict:
    """Run one cell; return ``{"output": html, "success": bool}``
    (the reference kernel's internal json shape)."""
    from preql_spark.display import table_repr
    from preql_spark.lang import LangSignal
    from preql_spark.table import Table
    try:
        res = engine.q(code)
    except LangSignal as e:
        return {"output": f"<pre>{_esc(str(e))}</pre>", "success": False}
    except Exception as e:  # noqa: BLE001 - kernel cells never raise
        return {"output": f"<pre>{_esc(type(e).__name__)}: "
                          f"{_esc(str(e))}</pre>", "success": False}
    if res is None:
        return {"output": "", "success": True}
    if isinstance(res, Table):
        return {"output": table_repr(res, fmt="html"), "success": True}
    return {"output": f"<pre>{_esc(repr(res))}</pre>", "success": True}


def complete_at(engine, code: str, cursor_pos: int) -> dict:
    """Jupyter ``do_complete`` payload at ``cursor_pos``."""
    from preql_spark.autocomplete import autocomplete
    context, fragment = last_word(code[:cursor_pos])
    names = autocomplete(engine, context)
    matches = sorted(k for k in names if k.startswith(fragment))
    return {
        "status": "ok",
        "matches": matches,
        "cursor_start": cursor_pos - len(fragment),
        "cursor_end": cursor_pos,
        "metadata": {},
    }


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# ---- ipykernel wiring (optional dependency) --------------------------------

def make_kernel_class():
    """Build the ipykernel-backed kernel class; raises ImportError
    with guidance when ipykernel is absent (this container)."""
    try:
        from ipykernel.kernelbase import Kernel
    except ImportError as e:  # pragma: no cover - no jupyter here
        raise ImportError(
            "ipykernel is required for the Jupyter kernel: "
            "pip install ipykernel") from e

    import preql_spark

    class PreqlSparkKernel(Kernel):  # pragma: no cover - needs jupyter
        implementation = "preql_spark"
        implementation_version = __version__
        language = "preql"
        language_version = __version__
        language_info = {
            "name": "preql",
            "mimetype": "text/x-pql",
            "file_extension": ".pql",
            "pygments_lexer": "go",   # reference uses the go lexer
        }
        banner = "preql_spark"

        _engine = None

        @property
        def engine(self):
            if PreqlSparkKernel._engine is None:
                PreqlSparkKernel._engine = preql_spark.connect()
            return PreqlSparkKernel._engine

        def do_execute(self, code, silent, store_history=True,
                       user_expressions=None, allow_stdin=False):
            if not silent:
                out = execute_to_html(self.engine, code)
                self.send_response(self.iopub_socket, "display_data", {
                    "data": {"text/html": out["output"]},
                    "metadata": {},
                })
            return {"status": "ok",
                    "execution_count": self.execution_count,
                    "payload": [], "user_expressions": {}}

        def do_complete(self, code, cursor_pos):
            return complete_at(self.engine, code, cursor_pos)

    return PreqlSparkKernel


KERNELSPEC = {
    "argv": [sys.executable, "-m", "preql_spark.jup_kernel", "-f",
             "{connection_file}"],
    "display_name": "preql_spark",
    "language": "preql",
}


def install_kernelspec(prefix: str | None = None) -> str:
    """Write the kernelspec json (reference jup_kernel/install.py)."""
    base = prefix or os.path.join(
        os.path.expanduser("~"), ".local", "share", "jupyter")
    d = os.path.join(base, "kernels", "preql_spark")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "kernel.json")
    with open(path, "w") as f:
        json.dump(KERNELSPEC, f, indent=2)
    return path


def main():  # pragma: no cover - needs jupyter
    if len(sys.argv) > 1 and sys.argv[1] == "install":
        print(install_kernelspec())
        return
    from ipykernel.kernelapp import IPKernelApp
    IPKernelApp.launch_instance(kernel_class=make_kernel_class())


if __name__ == "__main__":  # pragma: no cover
    main()
