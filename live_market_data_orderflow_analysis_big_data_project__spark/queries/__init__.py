"""The declared query contract: ``QUERIES`` maps query keys to
``(spark, sf_dir) -> DataFrame`` callables; ``ORACLE`` maps the same keys
to DuckDB-runnable ANSI SQL twins (omitted for non-SQL-expressible ops,
which the driver checks rows-only).

Conventions (SURVEY.md section 2.3): every float aggregate is decimal-backed
and/or ROUND(...,4) on BOTH sides; every timestamp/date output is a
formatted string; every top-k has a total-order tie-break; aggregate /
computed columns carry identical aliases on both sides.
"""

from __future__ import annotations

from . import rblock, eblock, lblock, sblock

_BLOCKS = (rblock, eblock, lblock, sblock)

QUERIES = {}
ORACLE = {}
for _b in _BLOCKS:
    QUERIES.update(_b.QUERIES)
    ORACLE.update({k: v for k, v in _b.ORACLE.items() if v is not None})
