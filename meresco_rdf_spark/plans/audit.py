"""Plan-introspection helpers (library form of tools/explain_audit.py).

These inspect the Catalyst/physical plan of a DataFrame so tests and CI
can assert the properties that matter at 100 TB — a filter that silently
stops pushing down, a broadcast that regresses to sort-merge, or an
aggregation that loses its partial (map-side) phase is a scale bug even
when results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        # filters separate on ", " followed by a capitalized predicate name;
        # plain "," also appears INSIDE predicates like EqualTo(lang,en)
        out.extend(f.strip() for f in re.split(r",\s+(?=[A-Z])", m.group(1))
                   if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def shuffle_count(df: DataFrame) -> int:
    return len(re.findall(r"Exchange hashpartitioning", executed_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    return bool(re.search(r"partial_\w+", executed_plan(df)))
