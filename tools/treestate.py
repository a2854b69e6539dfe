"""Shared tree-state stamp for the round's record artifacts.

The stamped artifacts (PYTEST_RUN.json, CORRECTNESS_LOCAL_r*.json,
SCALING_SWEEP_r*.json) are themselves written into the worktree before
they are committed — so a naive ``git status --porcelain`` check calls
the tree dirty the moment the first record lands, and every later
stamp (and tools/tally.py's freshness gate) reports STALE for a run
that was in fact clean.  Dirtiness here therefore means "anything
changed EXCEPT the round's own record artifacts": those files carry
provenance, they cannot change query/test behavior, and they are
swept into the snapshot commit together with the changelog.
"""

from __future__ import annotations

import fnmatch
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the round-record artifacts these tools themselves produce.
# BENCH_LOCAL.json belongs here too: bench.py rewrites it on every
# run (it is tracked for the judge but gitignored by intent), so
# without the exclusion any bench run dirties every later stamp.
RECORD_PATTERNS = (
    "PYTEST_RUN.json",
    "CORRECTNESS_LOCAL_r*.json",
    "SCALING_SWEEP_r*.json",
    "SCALING_CURVE_r*.json",
    "BENCH_LOCAL.json",
)


def head_sha() -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=str(REPO),
    ).stdout.strip()


def records_only_descendant(record_head: str) -> bool:
    """True when HEAD differs from ``record_head`` ONLY by the
    round-record artifacts (and docs snapshotting them: CHANGELOG).

    The snapshot commit that carries a stamped record into history
    necessarily has a different sha than the record's own ``head``
    field — the record cannot cite the commit that contains it. A
    record is still FRESH for that HEAD when every path changed
    between the two commits is itself a record artifact: provenance
    files cannot change query or test behavior."""
    if not record_head:
        return False
    proc = subprocess.run(
        ["git", "diff", "--name-only", f"{record_head}..HEAD"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    if proc.returncode != 0:
        return False  # unknown sha — treat as stale
    allowed = RECORD_PATTERNS + ("CHANGELOG_r*.md",)
    for path in proc.stdout.splitlines():
        path = path.strip()
        if path and not any(fnmatch.fnmatch(path, p) for p in allowed):
            return False
    return True


def tree_dirty() -> bool:
    """True when any TRACKED-OR-UNTRACKED path other than the round's
    record artifacts differs from HEAD."""
    porcelain = subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True,
        cwd=str(REPO),
    ).stdout
    for line in porcelain.splitlines():
        path = line[3:].split(" -> ")[-1].strip().strip('"')
        if not any(fnmatch.fnmatch(path, p) for p in RECORD_PATTERNS):
            return True
    return False
