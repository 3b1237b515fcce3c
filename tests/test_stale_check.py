"""tools/stale_check.py: the changed-code-must-re-enter-the-window gate.

Three claims: (1) the repo is currently clean (every out-of-window entry
AST-unchanged since its last driver row); (2) the closure walker reaches
across modules (a query function's package-internal helpers are in its
closure); (3) a synthetic mutation of an out-of-window entry's code IS
detected — the tool is a tripwire, not a formality.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "stale_check", os.path.join(REPO, "tools", "stale_check.py")
)
stale_check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(stale_check)


def test_repo_is_not_stale():
    """The invariant the driver relies on: all out-of-window entries are
    unchanged since their last driver row."""
    assert stale_check.main([]) == 0


def test_closure_crosses_modules():
    """q90's closure must include the llmops helper it calls, not just
    the lblock wrapper."""
    points = stale_check.entry_points()
    mod, fn, extra = points["q90_exact_dedup"]
    walker = stale_check._ClosureWalker(stale_check._read_worktree)
    members = walker.closure(mod, fn)
    mods = {m for m, _ in members}
    assert any(m.endswith("operators/llmops.py") for m in mods), members


@pytest.mark.parametrize("kind", ["body_edit", "helper_edit", "missing"])
def test_synthetic_mutation_detected(kind):
    """Mutating a closure member between 'old' and 'now' must surface as
    a diff; comment-only edits must NOT."""
    points = stale_check.entry_points()
    mod, fn, extra = points["q90_exact_dedup"]
    walker = stale_check._ClosureWalker(stale_check._read_worktree)
    members = sorted(walker.closure(mod, fn))
    # pick a cross-module helper to mutate for helper_edit
    helper = next(
        (m for m in members if m[0].endswith("operators/llmops.py")),
        members[0],
    )

    def old_source_of(relpath: str):
        src = stale_check._read_worktree(relpath)
        if src is None:
            return None
        if kind == "body_edit" and relpath == mod:
            return _mutate_fn(src, fn)
        if kind == "helper_edit" and relpath == helper[0]:
            return _mutate_fn(src, helper[1])
        if kind == "missing" and relpath == mod:
            return "# module existed but had no defs at the old commit\n"
        return src

    diffs = stale_check.changed_members(
        "q90_exact_dedup", mod, fn, extra, old_source_of
    )
    assert diffs, f"mutation kind={kind} not detected"


def _mutate_fn(src: str, name: str) -> str:
    """Rewrite ``def name(...)`` to have a semantically different body."""
    import ast

    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            node.body = [ast.Return(value=ast.Constant(value=None))]
            ast.fix_missing_locations(node)
            return ast.unparse(tree)
    # name is an Assign (SQL constant etc.): flip it to a sentinel
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == name for t in node.targets
        ):
            node.value = ast.Constant(value="__mutated__")
            ast.fix_missing_locations(node)
            return ast.unparse(tree)
    return src


def test_comment_only_edit_not_flagged():
    points = stale_check.entry_points()
    mod, fn, extra = points["q90_exact_dedup"]

    def old_source_of(relpath: str):
        src = stale_check._read_worktree(relpath)
        if src is None:
            return None
        if relpath == mod:
            return "# a comment that was not there before\n" + src
        return src

    diffs = stale_check.changed_members(
        "q90_exact_dedup", mod, fn, extra, old_source_of
    )
    assert not diffs, diffs


def test_is_driver_row_rejects_hash_fail_shapes():
    """hash_match=False with rows present (the real r02/r03 shape for
    then-failing entries) must NOT count as driver evidence; hash-pass
    and declared rows-only (err='no_oracle') must."""
    ok = stale_check._is_driver_row
    assert ok({"hash_match": True, "spark_rows": 5, "err": None})
    assert ok({"hash_match": None, "spark_rows": 25, "err": "no_oracle"})
    assert not ok({"hash_match": False, "spark_rows": 123, "err": None})
    assert not ok({"hash_match": None, "spark_rows": 10, "err": "boom"})
    assert not ok({"hash_match": None, "spark_rows": None,
                   "err": "no_oracle"})


def test_history_baselines_are_all_passes():
    """No entry's recorded last-pass round may correspond to a
    hash-fail record (regression guard for the _is_driver_row hole)."""
    import glob as _glob
    import json as _json

    history = stale_check.last_pass_commits()
    by_round = {}
    for path in sorted(_glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        by_round[rnd] = _json.load(open(path))
    for key, (rnd, _commit) in history.items():
        rec = by_round[rnd][key]
        assert stale_check._is_driver_row(rec), (key, rnd, rec)
        assert rec.get("hash_match") is not False, (key, rnd, rec)


def test_closure_includes_function_local_imports():
    """The r14 walker fix: nearly every gate entry imports its operator
    CALL-TIME inside the query function, so the closure must index
    nested ImportFrom nodes — the old top-level-only index silently
    excluded ALL operator code (found when a rolling.py refactor left
    q168's fingerprint unchanged).  Pin it with a synthetic module and
    with the real q168 closure."""
    sources = {
        "pkg/qmod.py": (
            "def entry():\n"
            "    from .opmod import helper\n"
            "    return helper()\n"
        ),
        "pkg/opmod.py": (
            "def helper():\n"
            "    return 42\n"
        ),
    }
    walker = stale_check._ClosureWalker(lambda rel: sources.get(rel))
    members = walker.closure("pkg/qmod.py", "entry")
    assert ("pkg/opmod.py", "helper") in members, members

    points = stale_check.entry_points()
    mod, fn, extra = points["q168_rolling_active"]
    real = stale_check._ClosureWalker(stale_check._read_worktree)
    mods = {m for m, _ in real.closure(mod, fn)}
    assert any(m.endswith("operators/rolling.py") for m in mods), mods


def test_closure_alias_collisions_visit_every_binding():
    """Two functions importing DIFFERENT helpers under the SAME local
    alias: the module-wide alias map must visit both bindings (sets,
    not last-wins) — under-approximating would silently drop one
    operator from the closure."""
    sources = {
        "pkg/qmod.py": (
            "def entry_a():\n"
            "    from .op_a import helper\n"
            "    return helper()\n"
            "\n"
            "def entry_b():\n"
            "    from .op_b import helper\n"
            "    return helper()\n"
        ),
        "pkg/op_a.py": "def helper():\n    return 1\n",
        "pkg/op_b.py": "def helper():\n    return 2\n",
    }
    walker = stale_check._ClosureWalker(lambda rel: sources.get(rel))
    members = walker.closure("pkg/qmod.py", "entry_a")
    # over-approximation is the safe direction: both bindings visited
    assert ("pkg/op_a.py", "helper") in members, members
    assert ("pkg/op_b.py", "helper") in members, members
