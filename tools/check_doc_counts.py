#!/usr/bin/env python
"""Assert the registry counts the docs claim match the LIVE registry.

The repo's credibility rests on its documentation being exact, and
round 11's verdict caught three stale counters (README "213 graded
queries" after 214 landed; COVERAGE's "208/208" and "122/122").  This
script makes the claims mechanical: it imports `__spark_entry__`
WITHOUT a SparkSession (the registry is plain dicts), derives the
true counts, and fails loudly when any documented number drifts.
Run standalone (`python tools/check_doc_counts.py`) or via the suite
(tests/test_docs.py::test_doc_counts_match_registry).
"""
from __future__ import annotations

import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_counts() -> tuple[int, int, list[str]]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_counts__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    o = mod.oracle_sql()
    rows_only = sorted(k for k in q if k not in o)
    stray = sorted(k for k in o if k not in q)
    if stray:
        raise AssertionError(f"oracle_sql() keys without a queries() "
                             f"entry: {stray}")
    return len(q), len(o), rows_only


def check() -> list[str]:
    n_q, n_oracled, rows_only = registry_counts()
    errors: list[str] = []

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"`__spark_entry__\.py` — (\d+) graded queries", readme)
    if not m:
        errors.append("README.md: missing the '<N> graded queries' claim")
    elif int(m.group(1)) != n_q:
        errors.append(f"README.md claims {m.group(1)} graded queries; "
                      f"registry has {n_q}")

    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"`tools/check_oracle\.py` — (\d+)/(\d+)\s*\n?green", cov)
    if not m:
        errors.append("COVERAGE.md: missing the 'check_oracle.py — N/N "
                      "green' claim")
    elif (int(m.group(1)), int(m.group(2))) != (n_q, n_q):
        errors.append(f"COVERAGE.md claims {m.group(1)}/{m.group(2)}; "
                      f"registry has {n_q}/{n_q}")
    m = re.search(r"\((\d+) value-hash matched", cov)
    if not m:
        errors.append("COVERAGE.md: missing the 'N value-hash matched' "
                      "claim")
    elif int(m.group(1)) != n_oracled:
        errors.append(f"COVERAGE.md claims {m.group(1)} value-hash "
                      f"matched; registry has {n_oracled} oracled queries")
    m = re.search(r"(\d+) rows-only BY DESIGN", cov)
    if not m:
        errors.append("COVERAGE.md: missing the 'N rows-only BY DESIGN' "
                      "claim")
    elif int(m.group(1)) != len(rows_only):
        errors.append(f"COVERAGE.md claims {m.group(1)} rows-only; "
                      f"registry has {len(rows_only)}: {rows_only}")
    m = re.search(r"FULL\s*\nregistry — (\d+) queries", cov)
    if m and int(m.group(1)) != n_q:
        errors.append(f"COVERAGE.md rotation-log intro claims "
                      f"{m.group(1)} queries; registry has {n_q}")
    return errors


def main() -> int:
    errs = check()
    n_q, n_oracled, rows_only = registry_counts()
    if errs:
        for e in errs:
            print(f"DRIFT: {e}", file=sys.stderr)
        return 1
    print(f"OK: {n_q} graded queries ({n_oracled} value-oracled, "
          f"{len(rows_only)} rows-only: {', '.join(rows_only)}); "
          "docs match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
