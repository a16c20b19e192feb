"""SPARQL-JSON result-binding ENCODE — the egress complement of
``sources.sparql_json.decode_bindings`` (reference ``fromDict``,
rdf/uri.py:35-36, rdf/literal.py:35-38, rdf/bnode.py:34-35: the
reference only decodes; a query engine must also produce the format).

W3C SPARQL 1.1 Query Results JSON: each solution row becomes one
bindings object ``{"v": {"type": ..., "value": ..., "xml:lang": ...}}``
with unbound variables and absent lang tags OMITTED (``to_json`` drops
null fields), so the output round-trips through ``decode_bindings``.

Everything is JVM-side column expressions (``struct`` + ``to_json``) —
at scale the bindings stream out as JSONL shards (``df.write.text``)
next to a driver-written head document; no collect in the operator.
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def solution_variables(df: DataFrame) -> List[str]:
    """Infer the solution variables of a ``sparql_select`` frame: every
    ``v`` with companion ``v_kind`` / ``v_lang`` columns, PLUS every
    remaining non-companion column (aggregate aliases project as single
    scalar columns — they are solution variables too, bound to plain
    literals)."""
    cols = set(df.columns)
    full = [c for c in df.columns
            if "%s_kind" % c in cols and "%s_lang" % c in cols]
    companions = {"%s_kind" % v for v in full} | {"%s_lang" % v
                                                  for v in full}
    return [c for c in df.columns if c in full or c not in companions]


def encode_bindings(df: DataFrame,
                    variables: Optional[Sequence[str]] = None,
                    out_col: str = "binding_json") -> DataFrame:
    """Solution frame -> one compact JSON bindings object per row."""
    if variables is None:
        variables = solution_variables(df)
        if not variables:
            raise ValueError("no solution variables (v/v_kind/v_lang "
                             "column triples) found")
    cols = set(df.columns)
    structs = []
    for v in variables:
        if v not in cols:
            raise ValueError("column %r not in frame" % v)
        if "%s_kind" % v in cols and "%s_lang" % v in cols:
            kind = F.col("%s_kind" % v)
            lang = F.col("%s_lang" % v)
        else:
            # aggregate / computed alias: a single scalar column is a
            # plain-literal binding (unbound when NULL)
            kind = F.when(F.col(v).isNotNull(), F.lit("literal"))
            lang = F.lit(None).cast("string")
        term = F.struct(
            kind.alias("type"),
            F.col(v).cast("string").alias("value"),
            lang.alias("xml:lang"))
        # NULL struct for an unbound variable -> key omitted by to_json
        structs.append(F.when(kind.isNotNull(), term).alias(v))
    return df.select(F.to_json(F.struct(*structs)).alias(out_col))


def head_document(variables: Sequence[str]) -> str:
    """The results document's head member (written once by the driver
    next to the bindings shards)."""
    return json.dumps({"head": {"vars": list(variables)}},
                      separators=(",", ":"))


def boolean_document(value: bool) -> str:
    """The ASK-result document (no bindings, one boolean member)."""
    return '{"head":{},"boolean":%s}' % ("true" if value else "false")


def results_document(df: DataFrame,
                     variables: Optional[Sequence[str]] = None) -> str:
    """TEST-SCALE helper: collect the full W3C results document as one
    string.  At scale use ``encode_bindings(...).write.text(...)`` +
    ``head_document`` instead."""
    if variables is None:
        variables = solution_variables(df)
    rows = encode_bindings(df, variables).collect()
    return ('{"head":{"vars":%s},"results":{"bindings":[%s]}}'
            % (json.dumps(list(variables), separators=(",", ":")),
               ",".join(r[0] for r in rows)))
