"""N-Quads egress: quad DataFrame -> ``.nq`` lines / files.

Write-side twin of ``sources.rdf_source.read_nquads_quads`` and the
quad-model counterpart of the ``.nt`` sink: the ``context`` column
becomes the 4th (graph) term — NULL context = default graph = no 4th
term, matching the SPARQL quad relation (default graph = context IS
NULL).  Like the ``.nt`` sink this is pure column expressions:
whole-stage codegen, zero Python, splittable output.  No reference
counterpart (the reference has no quad model); engine extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .nt_sink import nt_escape, ntriples_line


def nquads_line(subj: Column, pred: Column, obj_value: Column,
                obj_kind: Column, obj_lang: Column,
                context: Column) -> Column:
    triple = ntriples_line(subj, pred, obj_value, obj_kind, obj_lang)
    graph_tok = (
        F.when(context.isNull(), F.lit(None).cast("string"))
        .when(context.startswith("_:"), context)
        .otherwise(F.concat(F.lit("<"), nt_escape(context), F.lit(">"))))
    # splice the graph term before the terminating dot; concat_ws skips
    # the NULL graph_tok so default-graph rows stay valid N-Triples
    stmt = F.substring(triple, 1, F.length(triple) - 2)
    return F.concat_ws(" ", stmt, graph_tok, F.lit("."))


def nquads_lines(quads: DataFrame) -> DataFrame:
    """Quads -> one-column (``value``) DataFrame of N-Quads lines."""
    return quads.select(
        nquads_line(
            F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang"),
            F.col("context")).alias("value"))


def write_nquads(quads: DataFrame, path: str,
                 num_files: int | None = None,
                 mode: str = "overwrite") -> None:
    """Materialize as ``.nq`` text files (one line per quad,
    line-splittable on read)."""
    lines = nquads_lines(quads)
    if num_files:
        lines = lines.repartition(num_files)
    lines.write.mode(mode).option("compression", "none").text(path)
