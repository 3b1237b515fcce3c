from .ticks import best_bid_ask, classify_aggressor, parse_ticks
from .candles import ohlc_candles
from .asof import asof_join

__all__ = [
    "parse_ticks",
    "best_bid_ask",
    "classify_aggressor",
    "ohlc_candles",
    "asof_join",
]
