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

The round-11 rotation (docs/ROTATION_r11.md) promoted all 6 entries
staged at r10 close (q174 set-similarity join, q175 k-core, q176
collocation lift, q177 interval overlap join, s18 streaming funnel,
q178 skew diagnostics).  The r12 cohort is staged below as it is
built during round 11.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (cohort entries)

from ..sources.tables import load_table  # noqa: F401  (cohort entries)


STAGED_QUERIES: dict = {}

STAGED_ORACLE: dict = {}
