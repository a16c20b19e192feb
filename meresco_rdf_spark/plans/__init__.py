"""Physical-plan introspection: assertions that shipped plans keep their
scale properties (pushdown, pruning, broadcast, partial aggregation)."""

from .audit import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    has_partial_aggregation,
    optimized_plan,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)
