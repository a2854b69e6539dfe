"""Run the FULL test suite and stamp the result with the tree it ran
against (round-7 verdict task 3: the changelog's pytest line must
come from a full run OF the shipped tree, not an earlier one).

Writes PYTEST_RUN.json: {head, tree_dirty, passed, failed, errors,
duration_sec, pytest_tail}. tools/tally.py refuses to print a pytest
line unless this record exists, is green, and matches the current
HEAD of a clean tree.

Usage: python tools/full_test_run.py    (after the round's last commit)
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, cwd=str(REPO)
    ).stdout.strip()


def main() -> None:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    counts = {
        kind: int(n)
        for n, kind in re.findall(r"(\d+) (passed|failed|errors?)", tail)
    }
    sys.path.insert(0, str(REPO / "tools"))
    from treestate import tree_dirty

    record = {
        "head": git("rev-parse", "HEAD"),
        "tree_dirty": tree_dirty(),
        "returncode": proc.returncode,
        "passed": counts.get("passed", 0),
        "failed": counts.get("failed", 0) + counts.get("error", 0)
        + counts.get("errors", 0),
        "duration_sec": round(time.time() - t0, 1),
        "pytest_tail": tail,
    }
    out = REPO / "PYTEST_RUN.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(tail)
    print(f"wrote {out} (HEAD {record['head'][:12]}"
          f"{' DIRTY' if record['tree_dirty'] else ''})")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
