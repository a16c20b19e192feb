"""SPARQL-subset front-end over the triples relation.

The reference exposes programmatic BGP matching only
(``matchTriplePatterns``, reference graph.py:102-131); real consumers of
an RDF store write SPARQL.  This package adds a parsed/compiled
SELECT/CONSTRUCT/ASK/DESCRIBE/UPDATE subset — BGP, FILTER (incl. EXISTS / NOT EXISTS),
OPTIONAL, UNION, MINUS, VALUES, BIND, the §17.4 scalar built-ins,
property paths, GROUP BY aggregates (COUNT/SUM/AVG/MIN/MAX/SAMPLE/
GROUP_CONCAT) with HAVING, DISTINCT, ORDER BY, LIMIT/OFFSET, and the
Update forms (INSERT/DELETE DATA, DELETE WHERE, DELETE-INSERT WHERE) — that compiles to a pure
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
    sparql_update,
    sparql_update_quads,
    sparql_update_sets,
)

__all__ = ["parse_query", "sparql_ask", "sparql_construct",
           "sparql_describe", "sparql_select", "sparql_update",
           "sparql_update_quads", "sparql_update_sets"]
