"""tools/treestate.py — record artifacts must not dirty the stamp.

The round's stamped records (PYTEST_RUN.json etc.) are written into
the worktree before the snapshot commit; if their mere presence made
the tree "dirty", every stamp would invalidate itself the moment it
was written (the round-8 chicken-and-egg).  These tests pin the
exclusion semantics against a scratch git repo.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

import treestate  # noqa: E402


def _git(cwd: Path, *args: str) -> None:
    subprocess.run(
        ["git", *args], cwd=str(cwd), check=True, capture_output=True,
        env={
            "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
            "HOME": str(cwd), "PATH": "/usr/bin:/bin",
        },
    )


@pytest.fixture()
def scratch_repo(tmp_path, monkeypatch):
    _git(tmp_path, "init", "-q")
    (tmp_path / "code.py").write_text("x = 1\n")
    _git(tmp_path, "add", ".")
    _git(tmp_path, "commit", "-qm", "init")
    monkeypatch.setattr(treestate, "REPO", tmp_path)
    return tmp_path


def test_clean_tree_is_clean(scratch_repo):
    assert not treestate.tree_dirty()


def test_record_artifacts_do_not_dirty(scratch_repo):
    (scratch_repo / "PYTEST_RUN.json").write_text("{}\n")
    (scratch_repo / "CORRECTNESS_LOCAL_r08.json").write_text("{}\n")
    (scratch_repo / "SCALING_SWEEP_r09.json").write_text("{}\n")
    assert not treestate.tree_dirty()


def test_modified_tracked_record_artifact_does_not_dirty(scratch_repo):
    # BENCH_LOCAL.json is tracked (shipped for the judge) but
    # rewritten by every bench run — a modification must not dirty
    (scratch_repo / "BENCH_LOCAL.json").write_text("{}\n")
    _git(scratch_repo, "add", "BENCH_LOCAL.json")
    _git(scratch_repo, "commit", "-qm", "bench artifact")
    (scratch_repo / "BENCH_LOCAL.json").write_text('{"v": 2}\n')
    assert not treestate.tree_dirty()


def test_untracked_code_is_dirty(scratch_repo):
    (scratch_repo / "PYTEST_RUN.json").write_text("{}\n")
    (scratch_repo / "sneaky.py").write_text("y = 2\n")
    assert treestate.tree_dirty()


def test_modified_tracked_file_is_dirty(scratch_repo):
    (scratch_repo / "code.py").write_text("x = 2\n")
    assert treestate.tree_dirty()


def test_lookalike_directory_path_is_dirty(scratch_repo):
    # the exclusion is for the repo-root records, not any path whose
    # basename happens to match
    sub = scratch_repo / "pkg"
    sub.mkdir()
    (sub / "PYTEST_RUN.json").write_text("{}\n")
    assert treestate.tree_dirty()


def _head(cwd: Path) -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=str(cwd), check=True,
        capture_output=True, text=True,
    ).stdout.strip()


def test_records_only_descendant(scratch_repo):
    """The snapshot commit that carries a stamped record necessarily
    postdates the record's head — the record stays FRESH when the
    diff between the two commits touches only record artifacts (and
    the changelog), and goes stale the moment code changes ride
    along."""
    record_head = _head(scratch_repo)
    # snapshot commit: records + changelog only → still fresh
    (scratch_repo / "PYTEST_RUN.json").write_text("{}\n")
    (scratch_repo / "CHANGELOG_r9.md").write_text("notes\n")
    _git(scratch_repo, "add", ".")
    _git(scratch_repo, "commit", "-qm", "snapshot")
    assert treestate.records_only_descendant(record_head)
    # identical shas are trivially fresh
    assert treestate.records_only_descendant(_head(scratch_repo))
    # a code change after the record makes it stale
    (scratch_repo / "code.py").write_text("x = 3\n")
    _git(scratch_repo, "add", ".")
    _git(scratch_repo, "commit", "-qm", "code change")
    assert not treestate.records_only_descendant(record_head)
    # unknown/garbage shas are stale, not an error
    assert not treestate.records_only_descendant("0" * 40)
    assert not treestate.records_only_descendant("")
