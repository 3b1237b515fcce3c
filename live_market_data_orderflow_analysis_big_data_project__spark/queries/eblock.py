"""eblock — to be filled in."""

QUERIES = {}
ORACLE = {}
