"""Cross-sf sweep record gate (no Spark — record consistency only).

Every ROUND-bearing oracle entry must hold a three-sf pass record in
SWEEP.json whose closure fingerprint matches the worktree.  The q123
lesson made concrete: ROUND(double) divergence between Spark (HALF_UP)
and DuckDB (banker's on the scaled value) can surface at ONE scale only,
so a single-sf pass is not evidence for the class.  Editing a
rounding-sensitive entry without re-running ``tools/sweep_oracle.py``
fails here, the same way editing an out-of-window entry fails
tests/test_stale_check.py.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from sweep_oracle import RECORD, SFS, eligible_keys, fingerprint  # noqa: E402


def test_every_round_bearing_entry_has_fresh_three_sf_pass_record():
    assert os.path.exists(RECORD), (
        "SWEEP.json missing — run: python tools/sweep_oracle.py"
    )
    record = json.load(open(RECORD))
    problems = []
    for key in eligible_keys():
        rec = record.get(key)
        if rec is None:
            problems.append(f"{key}: no sweep record")
            continue
        missing = [sf for sf in SFS if not rec.get("sfs", {}).get(sf)]
        if missing:
            problems.append(f"{key}: not passing at {missing}")
        if rec.get("fingerprint") != fingerprint(key):
            problems.append(
                f"{key}: code/oracle changed since its sweep — re-run "
                "tools/sweep_oracle.py " + key
            )
    assert not problems, "\n".join(problems)
