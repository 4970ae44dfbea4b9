#!/usr/bin/env python
"""Generate OPERATORS.md: one row per driver-contract query — where it
lives, how it is checked (DuckDB oracle vs rows-only+named test), and
its docstring headline. Run: python tools/gen_operators.py"""

import inspect
import os
import sys


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    rows = []
    for name in sorted(qs):
        fn = qs[name]
        target = fn
        # unwrap functools/lambdas to the underlying callable when possible
        mod = getattr(target, "__module__", "?")
        qual = getattr(target, "__qualname__", getattr(target, "__name__", "?"))
        doc = inspect.getdoc(target) or ""
        headline = doc.split("\n")[0][:110] if doc else ""
        check = "SQL (DuckDB oracle)" if name in osql else "rows-only (test oracle)"
        rows.append((name, f"{mod}.{qual}", check, headline))

    with open("OPERATORS.md", "w") as f:
        f.write(
            "# OPERATORS — driver-contract query index (generated)\n\n"
            "One row per `__ray_entry__.queries()` entry. `SQL` = compared to a\n"
            "DuckDB oracle at sf0.01 by the driver AND at sf0.001 + adversarial\n"
            "corpora by the test harnesses; `rows-only` ops name their oracle\n"
            "(refsim golden / brute-force parity / planted fixtures) in tests.\n"
            f"Regenerate: `python tools/gen_operators.py`. Count: {len(rows)}\n"
            f"({sum(1 for r in rows if r[2].startswith('SQL'))} SQL-checked).\n\n"
            "| query | implementation | check | what |\n|---|---|---|---|\n"
        )
        for name, impl, check, headline in rows:
            f.write(f"| `{name}` | `{impl}` | {check} | {headline} |\n")
    print("wrote OPERATORS.md:", len(rows), "rows")


if __name__ == "__main__":
    main()
