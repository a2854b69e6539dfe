"""Print the CHANGELOG tally block from the TREE, not from memory.

Rounds 5 and 6 both shipped changelogs whose headline counts drifted
from the snapshot (hand-maintained numbers going stale as late
commits landed).  This tool derives every claimed count at run time:

* registered queries / oracle-backed queries — from the live registry
* test count — from pytest's own collector
* bench totals — from the shipped BENCH_LOCAL.json artifact

Usage: python tools/tally.py   (paste the output into CHANGELOG_rN.md)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from ccgp_data_wrangling_spark.queries import all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()

    collect = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    n_tests = 0
    for line in collect.stdout.splitlines():
        if " tests collected" in line or " test collected" in line:
            n_tests = int(line.split()[0])

    # the PASSED line only prints from a stamped full run of THIS tree
    # (round-7 verdict task 3; tools/full_test_run.py writes the record)
    sys.path.insert(0, str(REPO / "tools"))
    from treestate import head_sha, records_only_descendant, tree_dirty

    head = head_sha()
    dirty = tree_dirty()
    run_path = REPO / "PYTEST_RUN.json"
    run = json.loads(run_path.read_text()) if run_path.exists() else None
    if run is None:
        pytest_line = (
            "tests passed: NO FULL-RUN RECORD — run tools/full_test_run.py"
        )
    elif (
        run["head"] != head and not records_only_descendant(run["head"])
    ) or run["tree_dirty"] or dirty:
        pytest_line = (
            f"tests passed: STALE RECORD (ran at {run['head'][:12]}"
            f"{' dirty' if run['tree_dirty'] else ''}, HEAD is "
            f"{head[:12]}{' dirty' if dirty else ''}) — re-run "
            "tools/full_test_run.py"
        )
    elif run["returncode"] != 0:
        pytest_line = (
            f"tests passed: RED RUN at {run['head'][:12]} "
            f"({run['pytest_tail']})"
        )
    else:
        pytest_line = (
            f"tests passed: {run['passed']} (full run at "
            f"{run['head'][:12]}, {run['duration_sec']}s)"
        )

    bench_path = REPO / "BENCH_LOCAL.json"
    bench = (
        json.loads(bench_path.read_text()) if bench_path.exists() else None
    )

    print(f"registered queries: {len(qs)}")
    print(f"oracle-backed queries: {len(oracles)}")
    print(f"rows-only queries: {len(qs) - len(oracles)}")
    print(f"tests collected: {n_tests}")
    print(pytest_line)
    if bench:
        print(
            f"bench: {bench['value']} s over {len(bench['queries'])} "
            f"queries at sf{bench['sf']} "
            f"(loadavg_start {bench['loadavg_start']}, "
            f"contended={bench['contended']})"
        )
    else:
        print("bench: BENCH_LOCAL.json not present")


if __name__ == "__main__":
    main()
