from .hashstable import (
    avg_exact,
    dsum,
    fmt_date,
    fmt_minute,
    fmt_ts,
    round4,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "dsum",
    "avg_exact",
    "round4",
    "fmt_ts",
    "fmt_date",
    "fmt_minute",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
