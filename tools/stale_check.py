"""Staleness gate: changed query code MUST re-enter the driver window.

The external driver hash-verifies only the FIRST 50 ``queries()`` entries
per round, so the repo's evidence model is "every entry has a green row
in SOME round, and code unchanged since that row is still proven".  That
invariant was enforced by convention and broke twice (r4→r5: q121/s11/
q126-q128 changed after their last driver row without re-entering
``_PRIORITY``).  This tool enforces it mechanically:

for every ``queries()`` entry NOT in the current ``_PRIORITY`` window,
AST-diff the entry's transitive in-package function closure (its query
callable, every package-internal function/class/constant it reaches, and
its ORACLE SQL definition) against the code state at the commit of its
LAST driver-pass round (the commit that added ``CORRECTNESS_r{N}.json``
— the driver commits artifacts on top of the exact tree it verified).
Any out-of-window entry whose closure changed → FAIL.

Comparison is on ``ast.dump`` (no positions), so comment/whitespace-only
edits do not trip it.  Names that cannot be statically resolved
(builtins, third-party modules, dynamic access) are skipped — the gate is
a tripwire for the recurring failure mode (editing an operator and
forgetting the window), not a sound verifier.

Usage:  python tools/stale_check.py            # check, exit 1 on stale
        python tools/stale_check.py -v         # list each entry's verdict
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "live_market_data_orderflow_analysis_big_data_project__spark"
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# driver-evidence history: key -> (last pass round, commit of that round)
# --------------------------------------------------------------------------

def _is_driver_row(rec: dict) -> bool:
    """A usable driver row: hash-PASS, or a declared rows-only check
    (``err == 'no_oracle'``, hash never attempted).

    ``hash_match is False`` is a FAILED gate and must never count as
    evidence — CORRECTNESS_r02/r03 contain exactly that shape
    (hash_match=False, spark_rows set, err=None) for then-failing
    entries; treating it as a pass would let a known-failing entry
    escape the staleness gate once it leaves the window.
    """
    if rec.get("hash_match") is True:
        return True
    return (
        rec.get("hash_match") is None
        and rec.get("spark_rows") is not None
        and rec.get("err") == "no_oracle"
    )


def last_pass_commits() -> dict[str, tuple[int, str]]:
    out: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rel = os.path.basename(path)
        # A driver artifact must have EXACTLY ONE touching commit (the
        # driver writes it once per round).  A second commit would make
        # the anchor ambiguous: anchoring to the newest would silently
        # exempt every code change up to that commit (a lint/reformat
        # touching the JSON vacates the gate exactly when it should
        # fire), anchoring to the oldest mis-anchors a genuine
        # regeneration.  Neither guess is safe — fail loudly and make a
        # human adjudicate (split the hygiene commit, or re-run the
        # driver gate).
        commit = subprocess.run(
            ["git", "log", "--format=%H", "--", rel],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
        if not commit:
            continue  # artifact not committed yet (current round, pre-commit)
        if len(commit) > 1:
            raise SystemExit(
                f"STALE-CHECK INVARIANT BROKEN: {rel} was touched by "
                f"{len(commit)} commits; driver artifacts must be "
                "write-once.  Re-run the driver gate for this round or "
                "revert the non-driver edit — the staleness anchor is "
                "ambiguous until then."
            )
        data = json.load(open(path))
        for key, rec in data.items():
            if _is_driver_row(rec):
                prev = out.get(key)
                if prev is None or rnd > prev[0]:
                    out[key] = (rnd, commit[0])
    return out


# --------------------------------------------------------------------------
# static closure: (module_relpath, top_level_name) reachable from a function
# --------------------------------------------------------------------------

class _ModuleIndex:
    """Top-level defs + import aliases of one parsed module.

    ``exists`` resolves sibling-module existence against the SAME
    source supplier the walker reads from — resolving against the
    live worktree (the old behavior) is wrong for the git-commit-side
    walker, where a module may exist now but not at the anchor commit
    (or vice versa)."""

    def __init__(self, relpath: str, tree: ast.Module, exists=None):
        self._exists = exists if exists is not None else _exists_any
        self.relpath = relpath
        self.defs: dict[str, ast.stmt] = {}
        # local name -> {(module_relpath, original_name | None)}: a SET
        # because the dominant gate-entry pattern imports operators
        # CALL-TIME inside each function, so one local alias may bind
        # to different modules in different functions — the closure
        # visits every binding (over-approximating is the safe
        # direction for a staleness tripwire).
        self.imports: dict[str, set[tuple[str, str | None]]] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        self.defs[tgt.id] = node
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    self.defs[node.target.id] = node
        # imports are indexed over the WHOLE tree, not just tree.body:
        # function-local ``from ..operators.x import y`` is how nearly
        # every gate entry reaches its operator module, and indexing
        # only module-level imports silently excluded ALL of that code
        # from the closure (found r14: a rolling.py refactor left
        # q168's fingerprint unchanged).
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                mod = self._resolve_from(node)
                if mod is None:
                    continue
                for alias in node.names:
                    local = alias.asname or alias.name
                    self.imports.setdefault(local, set()).add(
                        (mod, alias.name)
                    )
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.startswith(PKG):
                        local = alias.asname or alias.name.split(".")[0]
                        rel = alias.name.replace(".", "/") + ".py"
                        self.imports.setdefault(local, set()).add(
                            (rel, None)
                        )

    def _resolve_from(self, node: ast.ImportFrom) -> str | None:
        """Resolve a ``from X import y`` to a package-internal relpath."""
        if node.level == 0:
            if not (node.module or "").startswith(PKG):
                return None
            base = node.module.split(".")
        else:
            pkg_parts = os.path.dirname(self.relpath).split("/")
            if node.level > 1:
                pkg_parts = pkg_parts[: len(pkg_parts) - (node.level - 1)]
            base = pkg_parts + (node.module.split(".") if node.module else [])
        cand = "/".join(base) + ".py"
        if self._exists(cand):
            return cand
        cand_pkg = "/".join(base) + "/__init__.py"
        if self._exists(cand_pkg):
            return cand_pkg
        return None


_WORKTREE_CACHE: dict[str, str | None] = {}


def _read_worktree(relpath: str) -> str | None:
    if relpath not in _WORKTREE_CACHE:
        p = os.path.join(REPO, relpath)
        _WORKTREE_CACHE[relpath] = (
            open(p).read() if os.path.exists(p) else None
        )
    return _WORKTREE_CACHE[relpath]


def _exists_any(relpath: str) -> bool:
    return _read_worktree(relpath) is not None


def _names_in(node: ast.AST) -> set[str]:
    out: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            out.add(sub.id)
        elif isinstance(sub, ast.Attribute):
            # the root of an attribute chain (e.g. ``llmops`` in
            # ``llmops.jaccard_pairs``) is a Name and caught above
            pass
    return out


class _ClosureWalker:
    def __init__(self, source_of):
        """``source_of(relpath) -> str | None`` supplies module sources."""
        self._source_of = source_of
        self._idx: dict[str, _ModuleIndex | None] = {}

    def index(self, relpath: str) -> _ModuleIndex | None:
        if relpath not in self._idx:
            src = self._source_of(relpath)
            if src is None:
                self._idx[relpath] = None
            else:
                try:
                    self._idx[relpath] = _ModuleIndex(
                        relpath,
                        ast.parse(src),
                        exists=lambda rel: self._source_of(rel)
                        is not None,
                    )
                except SyntaxError:
                    self._idx[relpath] = None
        return self._idx[relpath]

    def closure(self, relpath: str, name: str) -> set[tuple[str, str]]:
        seen: set[tuple[str, str]] = set()
        self._visit(relpath, name, seen)
        return seen

    def _visit(self, relpath: str, name: str,
               seen: set[tuple[str, str]]) -> None:
        if (relpath, name) in seen:
            return
        idx = self.index(relpath)
        if idx is None:
            return
        if name in idx.defs:
            seen.add((relpath, name))
            for ref in sorted(_names_in(idx.defs[name])):
                if ref == name:
                    continue
                if ref in idx.defs:
                    self._visit(relpath, ref, seen)
                if ref in idx.imports:
                    for mod, orig in sorted(idx.imports[ref]):
                        if orig is None or orig == "*":
                            # whole-module reference: too coarse to
                            # chase attribute-by-attribute; record the
                            # module file itself so ANY change there
                            # counts
                            seen.add((mod, "<module>"))
                        else:
                            self._visit(mod, orig, seen)
        elif name in idx.imports:
            for mod, orig in sorted(idx.imports[name]):
                if orig is None:
                    seen.add((mod, "<module>"))
                else:
                    self._visit(mod, orig, seen)

    def node_dump(self, relpath: str, name: str) -> str | None:
        if name == "<module>":
            src = self._source_of(relpath)
            if src is None:
                return None
            try:
                return ast.dump(ast.parse(src))
            except SyntaxError:
                return None
        idx = self.index(relpath)
        if idx is None or name not in idx.defs:
            return None
        return ast.dump(idx.defs[name])


# --------------------------------------------------------------------------
# entry points: query callables + their ORACLE SQL definitions
# --------------------------------------------------------------------------

def _oracle_value_names(idx: _ModuleIndex, key: str) -> set[str]:
    """Names referenced by ORACLE[key]'s value expression (e.g. Q99B_SQL,
    or the helper call building it)."""
    node = idx.defs.get("ORACLE")
    if node is None or not isinstance(node, ast.Assign):
        return set()
    val = node.value
    if not isinstance(val, ast.Dict):
        return set()
    for k, v in zip(val.keys, val.values):
        if isinstance(k, ast.Constant) and k.value == key:
            return _names_in(v)
    return set()


def entry_points() -> dict[str, tuple[str, str, set[str]]]:
    """key -> (module_relpath, func_name, extra oracle-expression names)."""
    from live_market_data_orderflow_analysis_big_data_project__spark import (  # noqa: E501
        queries as q,
    )

    walker = _ClosureWalker(_read_worktree)
    out = {}
    for key, fn in q._ALL_Q.items():
        mod = fn.__module__.replace(".", "/") + ".py"
        idx = walker.index(mod)
        extra = _oracle_value_names(idx, key) if idx else set()
        out[key] = (mod, fn.__name__, extra)
    return out


def changed_members(
    key: str,
    mod: str,
    fn_name: str,
    extra_names: set[str],
    old_source_of,
) -> list[str]:
    """Closure members whose AST differs between worktree and old source."""
    now = _ClosureWalker(_read_worktree)
    old = _ClosureWalker(old_source_of)
    members = now.closure(mod, fn_name)
    for name in sorted(extra_names):
        members |= now.closure(mod, name)
    diffs = []
    for relpath, name in sorted(members):
        if now.node_dump(relpath, name) != old.node_dump(relpath, name):
            diffs.append(f"{relpath}::{name}")
    return diffs


def _git_source_of(commit: str):
    cache: dict[str, str | None] = {}

    def get(relpath: str) -> str | None:
        if relpath not in cache:
            r = subprocess.run(
                ["git", "show", f"{commit}:{relpath}"],
                cwd=REPO, capture_output=True, text=True,
            )
            cache[relpath] = r.stdout if r.returncode == 0 else None
        return cache[relpath]

    return get


def main(argv: list[str]) -> int:
    verbose = "-v" in argv
    from live_market_data_orderflow_analysis_big_data_project__spark import (  # noqa: E501
        queries as q,
    )

    window = set(q._PRIORITY)
    history = last_pass_commits()
    points = entry_points()
    old_sources: dict[str, object] = {}
    stale: list[tuple[str, int, list[str]]] = []
    for key, (mod, fn_name, extra) in sorted(points.items()):
        if key in window:
            if verbose:
                print(f"  in-window        {key}")
            continue
        if key not in history:
            stale.append((key, -1, ["<no driver row in any round>"]))
            continue
        rnd, commit = history[key]
        if commit not in old_sources:
            old_sources[commit] = _git_source_of(commit)
        diffs = changed_members(key, mod, fn_name, extra,
                                old_sources[commit])
        if diffs:
            stale.append((key, rnd, diffs))
        elif verbose:
            print(f"  unchanged since r{rnd}  {key}")
    if stale:
        print("STALE: code changed after last driver row and entry is "
              "NOT in the _PRIORITY window:")
        for key, rnd, diffs in stale:
            tag = f"r{rnd}" if rnd > 0 else "never"
            print(f"  {key} (last driver row: {tag})")
            for d in diffs[:8]:
                print(f"      changed: {d}")
        return 1
    print(f"OK: all {len(points) - len(window)} out-of-window entries "
          f"unchanged since their last driver row "
          f"({len(window)} in-window entries exempt).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
