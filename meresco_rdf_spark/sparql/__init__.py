"""SPARQL-subset front-end over the triples relation.

The reference exposes programmatic BGP matching only
(``matchTriplePatterns``, reference graph.py:102-131); real consumers of
an RDF store write SPARQL.  This package adds a parsed/compiled
SELECT/CONSTRUCT subset — BGP, FILTER (incl. EXISTS / NOT EXISTS),
OPTIONAL, UNION, MINUS, VALUES, BIND, property paths, GROUP BY aggregates
with HAVING, DISTINCT, ORDER BY, LIMIT/OFFSET — that compiles to a pure
DataFrame plan (aliased pruned scans + equi-joins), so Catalyst/AQE does
the physical planning (pushdown, broadcast, join reordering) exactly as
for the hand-built operators.
"""

from .parser import parse_query
from .compiler import (
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
)

__all__ = ["parse_query", "sparql_ask", "sparql_construct",
           "sparql_describe", "sparql_select"]
