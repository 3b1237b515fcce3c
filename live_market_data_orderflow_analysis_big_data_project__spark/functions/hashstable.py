"""Hash-stable aggregate/formatting conventions (SURVEY.md section 7.3).

The correctness gate compares Spark output against a DuckDB oracle with an
order-insensitive *value hash*, so floating-point results must be
bit-identical across engines.  Conventions used by every declared query:

- **Sums of doubles go through DECIMAL(18,4).**  Double summation order
  differs between engines (and between Spark partitions run-to-run); decimal
  summation is exact and associative, so ``sum(cast(x as decimal))`` is
  deterministic in both engines.  Cast back to double at the end.
- **Averages** = exact decimal sum (as double) / count — one IEEE division
  of bit-identical operands, hence bit-identical, with NO rounding.
- **ROUND(x, 4) only on irrational/transcendental outputs** (sqrt, ln, pow,
  cosine similarity), where libm implementations may differ in the last ulp
  but a decimal half-way boundary hit has ~zero probability.  Rounding
  rational values (money averages, ratios) is *dangerous*: they can land
  exactly on .xxxx5 boundaries where Spark (HALF_UP) and DuckDB
  (half-to-even on the scaled double) disagree.  For such values either do
  the arithmetic in DECIMAL end-to-end or emit the unrounded division.
- **Timestamps/dates are emitted as formatted strings**, never raw
  timestamp values, so engine-internal precision/timezone representations
  can't leak into the hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches CAST(x AS DECIMAL(18,4)) on the DuckDB side: 4 fractional digits
# is enough for the 2-decimal fixture money/value columns and products
# thereof (rounded to 4 first when needed).
_DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact (decimal-backed) sum of a double column, returned as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``.
    """
    out = F.sum(_c(col).cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def avg_exact(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum (as double) / count.

    One IEEE division of bit-identical operands — no rounding needed (and
    rounding would *add* boundary risk, see module docstring).  Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = _c(col)
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def round4(col: Column | str, alias: str | None = None) -> Column:
    out = F.round(_c(col).cast("double"), 4)
    return out.alias(alias) if alias else out


def fmt_ts(col: Column | str, alias: str | None = None) -> Column:
    """Timestamp -> 'yyyy-MM-dd HH:mm:ss.SSSSSS' string (microseconds).

    Oracle twin: ``strftime(ts, '%Y-%m-%d %H:%M:%S.%f')``.
    """
    out = F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return out.alias(alias) if alias else out


def fmt_minute(col: Column | str, alias: str | None = None) -> Column:
    """Timestamp -> minute-resolution string; oracle twin
    ``strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M')``."""
    out = F.date_format(_c(col), "yyyy-MM-dd HH:mm")
    return out.alias(alias) if alias else out


def fmt_date(col: Column | str, alias: str | None = None) -> Column:
    """Timestamp/date -> 'yyyy-MM-dd' string; oracle twin
    ``strftime(x, '%Y-%m-%d')``."""
    out = F.date_format(_c(col), "yyyy-MM-dd")
    return out.alias(alias) if alias else out
