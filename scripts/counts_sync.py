"""Derive the test/query counts quoted in README.md and COVERAGE.md
from the code itself — `pytest --collect-only` and `len(queries())` —
so the docs can never drift from the suite (the hand-synced literals
went stale three rounds running).

Usage:
    python scripts/counts_sync.py          # rewrite in place
    python scripts/counts_sync.py --check  # exit 1 if anything is stale
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_counts() -> tuple[int, int, int]:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        raise RuntimeError(f"could not parse pytest collection:\n{out[-500:]}")
    n_tests = int(m.group(1))
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    n_queries = len(E.queries())
    n_oracles = len(E.oracle_sql())
    return n_tests, n_queries, n_oracles


def rewrite(path: str, subs: list[tuple[str, str]], check: bool) -> bool:
    prev = open(path).read()
    out = prev
    for pat, repl in subs:
        out, n = re.subn(pat, repl, out)
        if n == 0:
            raise RuntimeError(f"{path}: pattern not found: {pat}")
    if out == prev:
        return False
    if not check:
        with open(path, "w") as f:
            f.write(out)
    return True


def main() -> None:
    check = "--check" in sys.argv
    n_tests, n_queries, n_oracles = collect_counts()
    stale = []
    if rewrite(
        os.path.join(REPO, "README.md"),
        [(
            r"\d+ tests incl\. \d+/\d+ DuckDB-oracle",
            f"{n_tests} tests incl. {n_oracles}/{n_queries} DuckDB-oracle",
        )],
        check,
    ):
        stale.append("README.md")
    if rewrite(
        os.path.join(REPO, "COVERAGE.md"),
        [(
            r"\*\*\d+ of \d+ queries oracle-checked",
            f"**{n_oracles} of {n_queries} queries oracle-checked",
        )],
        check,
    ):
        stale.append("COVERAGE.md")
    print(
        {
            "tests": n_tests,
            "queries": n_queries,
            "oracles": n_oracles,
            "rewrote": stale,
        }
    )
    if check and stale:
        sys.exit(1)


if __name__ == "__main__":
    main()
