"""Registry-ordering contract.

The external verifier samples the FIRST 50 entries of ``all_queries()``
in iteration order, so ordering is part of the driver contract:
every query that has never received a green driver CORRECTNESS row —
and every newly added query — must sit inside that window.

Green-ness is computed from the recorded CORRECTNESS_r*.json files
with the same rules as tools/rotate_registry.py (a hardcoded name set
went stale the first time a new round landed — this stays current by
construction).
"""

import glob
import json
import re

from ccgp_data_wrangling_spark.queries import _PRIORITY, all_oracles, all_queries


def _driver_green() -> set[str]:
    """Names whose LATEST driver row is green (rows+schema+hash, no err)."""
    last: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for name, rec in json.load(open(path)).items():
            ok = (
                isinstance(rec, dict)
                and not rec.get("err")
                and rec.get("rows_match") is not False
                and rec.get("schema_match") is not False
                and rec.get("hash_match") is not False
            )
            if name not in last or rnd >= last[name][0]:
                last[name] = (rnd, ok)
    return {n for n, (_, ok) in last.items() if ok}


def test_never_green_queries_fill_driver_window():
    """All never-green queries fit in the 50-slot window — or, when
    there are more than 50, the window must be filled ENTIRELY with
    never-green queries: a slot spent re-checking an already-green
    query while a never-green one waits outside would waste the
    driver's budget."""
    green = _driver_green()
    names = list(all_queries())
    window = names[:50]
    never_green = [n for n in names if n not in green]
    outside = [n for n in never_green if n not in set(window)]
    if outside:
        wasted = [n for n in window if n in green]
        assert not wasted, (
            f"green queries {wasted} occupy window slots while "
            f"never-green {outside} wait outside"
        )


def test_priority_names_all_registered():
    names = set(all_queries())
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names with no registered query: {missing}"


def test_priority_prefix_is_respected():
    names = list(all_queries())
    expected = [n for n in _PRIORITY if n in set(names)]
    assert names[: len(expected)] == expected


def test_every_query_has_oracle_or_is_known_exception():
    # rows-only checks are weaker; keep the no-oracle set explicit.
    no_oracle_ok = set()
    missing = set(all_queries()) - set(all_oracles()) - no_oracle_ok
    assert not missing, f"queries without oracle SQL: {missing}"
