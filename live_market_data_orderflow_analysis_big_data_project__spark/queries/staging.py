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

The round-15 rotation (docs/ROTATION_r15.md) promoted the full staged
pool: q193 IVF-PQ top-k, q194 batched BPE, q195 hyperplane bit-LSH
top-k, q196 char-entropy screen -> queries/ablock.py; s22 streaming
as-of enrichment, s23 top-k ranking drift, s24 CUSUM drift, s25
rolling distinct actives -> queries/sblock.py.

Window arithmetic for entries staged here now (docs/ROTATION_r15.md
look-ahead): the r16 and r17 windows are fully consumed by the 50
r12-latest / 50 r13-latest age-rule re-entry cohorts, so anything
staged during r15/r16 holds pytest-only evidence until the r18
rotation unless a window entry fails and frees a slot.  Entries
staged here must therefore carry the full evidence class (3-sf
hash-pass, 16x probe where batch, plan/determinism/dtype audits,
unit + binding tests) and expect to stand on it for two rounds.
"""

from __future__ import annotations


STAGED_QUERIES = {}

STAGED_ORACLE = {}
