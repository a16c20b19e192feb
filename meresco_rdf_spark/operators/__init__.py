from .graph_ops import (  # noqa: F401
    add_triples,
    contains,
    find_labels,
    in_degrees,
    literal_values,
    match_patterns,
    objects,
    remove_triples,
    scan,
    triples_df,
)
