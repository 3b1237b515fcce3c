"""sblock — to be filled in."""

QUERIES = {}
ORACLE = {}
