"""Column-function library: the reference's scalar functions (SURVEY.md
§2.5 'scalar functions' row) as vectorized Spark expressions."""

from .scalar_fns import (  # noqa: F401
    curie_to_uri_col,
    fragment,
    is_bnode,
    matches_iri,
    normalize_node_id,
    uri_join,
    uri_to_curie_col,
)
