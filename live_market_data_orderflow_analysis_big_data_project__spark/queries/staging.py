"""Next-rotation staging: gate entries authored and oracle-verified
BEFORE they enter the driver window.

The round-8 lesson encoded as process: a new ``queries()`` entry only
holds evidence if it is inside the 50-slot driver window, and window
slots are contended (rotation freshness vs new surface).  So new
entries are staged here — same (spark, sf_dir) -> DataFrame contract,
same oracle-SQL twins, exercised by tests/test_next_rotation.py with
the EXACT driver compare (check_oracle's normalize + hash) on every
pytest run — and promoted into queries()/oracle_sql() when a window
slot opens.  Promotion is a dict move, not new code.

The round-10 rotation (docs/ROTATION_r10.md) promoted all 11 staged
entries: q142/q143/q144/q149/q152/q170/q171/q172/q173 into
queries/ablock.py and s14/s15 into queries/sblock.py.  New round-10
staged entries for the r11 window are added below as they are
authored.
"""

from __future__ import annotations


STAGED_QUERIES: dict = {}

STAGED_ORACLE: dict = {}
