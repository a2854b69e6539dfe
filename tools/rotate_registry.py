"""Regenerate the query-registry priority list from CORRECTNESS files.

The driver verifies only the FIRST 50 registered queries each round,
so registration order is coverage policy: every query that has never
received a green driver row should occupy the window before anything
already verified. This tool recomputes that order from the recorded
CORRECTNESS_r*.json files and prints (or rewrites) the `_PRIORITY`
block in ccgp_data_wrangling_spark/queries/__init__.py.

Ordering produced:
1. queries with a RED driver row and no later green (must overwrite
   the stale verdict first),
2. queries with no driver row in any round (never verified), in
   registration order,
3. greens, oldest-verified round first (stalest re-verification).

Usage:
    python tools/rotate_registry.py           # print the new list
    python tools/rotate_registry.py --write   # rewrite __init__.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

INIT = "ccgp_data_wrangling_spark/queries/__init__.py"


def _round_files() -> list[tuple[int, str]]:
    out = []
    for p in glob.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def _is_green(rec: object) -> bool:
    """A driver row counts green if no recorded check failed."""
    if not isinstance(rec, dict):
        return False
    if rec.get("err"):
        return False
    for k in ("rows_match", "schema_match", "hash_match"):
        if rec.get(k) is False:
            return False
    return True


def compute_priority() -> list[str]:
    import __spark_entry__ as ent

    registered = list(ent.queries().keys())
    last_verdict: dict[str, tuple[int, bool]] = {}
    for rnd, path in _round_files():
        data = json.load(open(path))
        for name, rec in data.items():
            last_verdict[name] = (rnd, _is_green(rec))

    reds = [n for n in registered if n in last_verdict and not last_verdict[n][1]]
    never = [n for n in registered if n not in last_verdict]
    greens = sorted(
        (n for n in registered if n in last_verdict and last_verdict[n][1]),
        key=lambda n: last_verdict[n][0],
    )
    return reds + never + greens


def rewrite(priority: list[str]) -> None:
    src = open(INIT).read()
    body = "\n".join(f'    "{n}",' for n in priority)
    new = re.sub(
        r"_PRIORITY: list\[str\] = \[\n.*?\n\]",
        f"_PRIORITY: list[str] = [\n{body}\n]",
        src,
        count=1,
        flags=re.S,
    )
    if new == src:
        raise SystemExit("no _PRIORITY block replaced — aborting")
    open(INIT, "w").write(new)


if __name__ == "__main__":
    prio = compute_priority()
    print(f"# {len(prio)} queries; first 50 = driver window")
    for i, n in enumerate(prio[:60]):
        print(f"{i:3d}  {n}")
    if "--write" in sys.argv:
        rewrite(prio)
        print(f"\nrewrote {INIT}")
