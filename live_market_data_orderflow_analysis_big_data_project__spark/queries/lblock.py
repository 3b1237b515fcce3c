"""lblock — to be filled in."""

QUERIES = {}
ORACLE = {}
