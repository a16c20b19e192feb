"""SPARQL-subset front-end over the triples relation.

The reference exposes programmatic BGP matching only
(``matchTriplePatterns``, reference graph.py:102-131); real consumers of
an RDF store write SPARQL.  This package adds a parsed/compiled SELECT
subset — BGP, FILTER, OPTIONAL, UNION, DISTINCT, ORDER BY, LIMIT/OFFSET —
that compiles to a pure DataFrame plan (aliased pruned scans + equi-joins),
so Catalyst/AQE does the physical planning (pushdown, broadcast,
join reordering) exactly as for the hand-built operators.
"""

from .parser import parse_query
from .compiler import sparql_select

__all__ = ["parse_query", "sparql_select"]
