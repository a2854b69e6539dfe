"""The bench stdout line must survive the driver's bounded tail capture.

BENCH_r05.json and BENCH_r06.json both arrived `"parsed": null` because
bench.py printed the FULL per-query map (86 entries) as its "one JSON
line" and the driver keeps only a short tail of stdout — the head of
the line was cut and the artifact was mid-JSON garbage.  These tests
replay exactly that failure mode against `bench.stdout_summary`: build
a result far larger than today's registry, serialize the summary the
way main() does, keep only the LAST N bytes (a tail capture drops the
front), and require the line to still parse with the headline fields
intact.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import stdout_summary  # noqa: E402


def _fake_result(n_queries: int) -> dict:
    return {
        "metric": "total_query_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": {
            f"very_long_query_name_family_{i:04d}": round(0.001 * i, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "loadavg_start": [0.18, 0.25, 0.31],
        "loadavg_end": [1.0, 0.5, 0.3],
        "ncpu": 32,
        "contended": False,
        "out_file": "BENCH_LOCAL.json",
    }


def test_summary_is_bounded_regardless_of_registry_size():
    # 500 queries ≫ the 86 that broke r6; the line must stay ~1 KB.
    line = json.dumps(stdout_summary(_fake_result(500)), separators=(",", ":"))
    assert len(line) < 1536, len(line)


def test_summary_survives_2048_byte_tail_capture():
    result = _fake_result(500)
    stdout = "some earlier log noise\n" * 40 + json.dumps(
        stdout_summary(result), separators=(",", ":")
    ) + "\n"
    tail = stdout[-2048:]  # driver keeps a bounded tail → front is cut
    last_line = tail.rstrip("\n").rsplit("\n", 1)[-1]
    parsed = json.loads(last_line)
    assert parsed["metric"] == "total_query_sec"
    assert parsed["value"] == 123.456
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 500
    assert parsed["out_file"] == "BENCH_LOCAL.json"
    assert len(parsed["queries"]) == 10  # slowest-10 only


def test_summary_keeps_the_slowest_queries():
    parsed = stdout_summary(_fake_result(100))
    assert set(parsed["queries"]) == {
        f"very_long_query_name_family_{i:04d}" for i in range(90, 100)
    }


def test_real_bench_module_emits_parsable_tail(tmp_path):
    """End-to-end pipe check: import bench, fake a full result through
    stdout_summary via a subprocess that prints it after log noise, cut
    to a 2048-byte tail, parse.  Proves the capture path, not just the
    function."""
    script = (
        "import json, sys; sys.path.insert(0, %r); "
        "from bench import stdout_summary; "
        "from tests.test_bench_stdout import _fake_result; "
        "sys.stdout.write('noise line\\n' * 100); "
        "print(json.dumps(stdout_summary(_fake_result(300)), "
        "separators=(',', ':')))" % str(REPO)
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(REPO),
    ).stdout
    tail = out[-2048:]
    parsed = json.loads(tail.rstrip("\n").rsplit("\n", 1)[-1])
    assert parsed["n_queries"] == 300
