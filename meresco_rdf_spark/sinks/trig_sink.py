"""TriG egress: quad DataFrame -> graph-blocked ``.trig`` text.

Write-side twin of ``sources.rdf_source.read_trig_quads`` and the
quad-model sibling of the Turtle sink.  Each (graph, subject) group
becomes one self-contained block::

    <g> { <s> p1 o1 ;
        p2 o2 . }

TriG allows the same graph label on any number of blocks (the graph is
their union, spec §2.2), so per-subject blocks — rather than one giant
block per graph — keep the encoding pure column expressions with ONE
window shuffle and two scalars of per-group state: hub graphs with
billions of triples stream through, no collected arrays, and every
output shard is independently valid TriG.  Default-graph rows (NULL
context) are emitted as bare Turtle statements, which TriG admits
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..namespaces import namespaces as _ns
from .nt_sink import nt_escape
from .turtle_sink import _term

_RDF_TYPE = _ns.curieToUri("rdf:type")


def trig_lines(quads: DataFrame) -> DataFrame:
    """Quads -> one-column (``value``) DataFrame of TriG lines,
    (graph, subject)-grouped.  One window shuffle; no arrays, no
    Python."""
    w = Window.partitionBy("context", "subj").orderBy(
        "pred", "obj_kind", "obj_value", "obj_lang")
    rn = F.row_number().over(w)
    total = F.count("*").over(Window.partitionBy("context", "subj"))

    ctx = F.col("context")
    graph_tok = F.when(ctx.startswith("_:"), ctx).otherwise(
        F.concat(F.lit("<"), nt_escape(ctx), F.lit(">")))
    subj_tok = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
        .otherwise(F.concat(F.lit("<"), nt_escape(F.col("subj")),
                            F.lit(">")))
    pred_tok = F.when(F.col("pred") == _RDF_TYPE, F.lit("a")).otherwise(
        F.concat(F.lit("<"), nt_escape(F.col("pred")), F.lit(">")))
    obj_tok = _term(F.col("obj_value"), F.col("obj_kind"),
                    F.col("obj_lang"))

    open_block = F.when(ctx.isNull(), F.lit("")) \
        .otherwise(F.concat(graph_tok, F.lit(" { ")))
    head = F.when(rn == 1, F.concat(open_block, subj_tok, F.lit(" "))) \
        .otherwise(F.lit("    "))
    close_block = F.when(ctx.isNull(), F.lit(" .")).otherwise(F.lit(" . }"))
    tail = F.when(rn == total, close_block).otherwise(F.lit(" ;"))
    return quads.select(
        F.concat(head, pred_tok, F.lit(" "), obj_tok, tail).alias("value"))


def write_trig(quads: DataFrame, path: str,
               num_files: int | None = None,
               mode: str = "overwrite") -> None:
    """Materialize as TriG text files.  ``coalesce`` (not repartition)
    preserves the window's intra-partition ordering, keeping each
    (graph, subject) block's lines contiguous."""
    lines = trig_lines(quads)
    if num_files:
        lines = lines.coalesce(num_files)
    lines.write.mode(mode).option("compression", "none").text(path)
