"""RDF/XML ingest: files / directories / XML columns -> triples DataFrame.

Distributed equivalent of the reference's ``GraphComponent`` + ``RDFParser``
pipeline (``graphcomponent.py:40-80``: walk dirs, content-type by extension,
parse each document into one graph; context = ``file:<basename>``).

Scale shape (SURVEY.md §3 E1): the parser is per-document pure, so it
parallelizes embarrassingly — one Arrow-batched ``mapInPandas`` over a
DataFrame of XML strings, emitting triple rows.  No shuffle until the
caller dedups or repartitions.  Malformed documents are quarantined into
``error`` rows rather than failing the job (a 100-TB ingest must not die
on one bad file).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph import Graph
from ..model import node_to_row

TRIPLE_WITH_CONTEXT_SCHEMA = (
    "context string, subj string, pred string, obj_value string, "
    "obj_kind string, obj_lang string, error string"
)


def _parse_documents(batches) -> Iterator:
    """mapInPandas worker: (context, xml) batches -> triple rows.

    Deterministic bnode ids: the per-document parser uses the process-global
    counter, so we re-scope ids per document (bnode labels are
    document-scoped in RDF; reference resets the counter per test the same
    way, rdfparsertest.py:85)."""
    import pandas as pd

    from ..model import BNode
    from ..rdfxml.parser import RDFParser

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}

        def emit(context, subj, pred, value, kind, lang, error=None):
            out["context"].append(context)
            out["subj"].append(subj)
            out["pred"].append(pred)
            out["obj_value"].append(value)
            out["obj_kind"].append(kind)
            out["obj_lang"].append(lang)
            out["error"].append(error)

        for context, xml in zip(batch["context"], batch["xml"]):
            try:
                BNode.nextGenId = 0
                graph = RDFParser(sink=Graph()).parse(ET.fromstring(xml))
                scope = "_:d" + _stable_hash(context)
                for s, p, o in graph.triples():
                    subj, pred, value, kind, lang = node_to_row(s, p, o)
                    if subj.startswith("_:"):
                        subj = scope + subj[1:]
                    if kind == "bnode":
                        value = scope + value[1:]
                    emit(context, subj, pred, value, kind, lang)
            except Exception as exc:  # quarantine, don't fail the job
                emit(context, None, None, None, "error", None,
                     "%s: %s" % (type(exc).__name__, exc))
        yield pd.DataFrame(out)


def _stable_hash(text: str) -> str:
    import hashlib

    return hashlib.sha1(text.encode("utf-8")).hexdigest()[:12]


def read_rdfxml_documents(spark: SparkSession, path: str) -> DataFrame:
    """Recursive ``*.rdf`` file listing -> (context, xml) DataFrame.
    Context = ``file:<basename>`` (reference graphcomponent.py:80)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.rdf")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return df.select(
        F.concat(F.lit("file:"), F.element_at(F.split(F.col("path"), "/"), -1)
                 ).alias("context"),
        F.decode(F.col("content"), "utf-8").alias("xml"),
    )


def read_rdfxml_triples(spark_or_df, path: str | None = None,
                        keep_errors: bool = False) -> DataFrame:
    """RDF/XML -> triples DataFrame.

    Either ``read_rdfxml_triples(spark, '/dir')`` or pass a prepared
    (context, xml) DataFrame.  Output columns: context + the 5 triple
    columns (+ error when ``keep_errors``)."""
    if path is not None:
        docs = read_rdfxml_documents(spark_or_df, path)
    else:
        docs = spark_or_df
    triples = docs.mapInPandas(_parse_documents, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    if keep_errors:
        return triples
    return triples.filter(F.col("error").isNull()).drop("error")


# Java-regex twin of rdfxml.ntriples._LINE_RE (numbered groups; Spark's
# regexp_extract is Java-flavored, no (?P<>) syntax)
_NT_LINE_JAVA = (
    r'^\s*(<[^<>\s]*>|_:\S+)\s+(<[^<>\s]*>)\s+'
    r'(<[^<>\s]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^<>\s]*>)?)\s*\.\s*$')
_NT_LITERAL_JAVA = (
    r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*))?(?:\^\^<[^<>\s]*>)?$')


def _parse_nt_lines_python(batches) -> Iterator:
    """mapInPandas worker for lines that carry escape sequences: re-parse
    each line with the exact pure-Python parser (rdfxml.ntriples)."""
    import pandas as pd

    from ..model import node_to_row
    from ..rdfxml.ntriples import parse_ntriples_line

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}
        for context, line in zip(batch["context"], batch["line"]):
            try:
                parsed = parse_ntriples_line(line)
                if parsed is None:
                    continue
                subj, pred, value, kind, lang = node_to_row(*parsed)
                row = (context, subj, pred, value, kind, lang, None)
            except Exception as exc:
                row = (context, None, None, None, "error", None,
                       "%s: %s" % (type(exc).__name__, exc))
            for key, cell in zip(out, row):
                out[key].append(cell)
        yield pd.DataFrame(out)


def read_ntriples_triples(spark: SparkSession, path: str,
                          keep_errors: bool = False,
                          glob: str = "*.nt") -> DataFrame:
    """N-Triples files -> triples DataFrame (context = ``file:<basename>``,
    mirroring the reference's declared ``.nt`` -> text/plain content-type
    path, graphcomponent.py:68-74 — dead there, real here).

    Scale shape: ``spark.read.text`` is line-splittable, so one huge
    ``.nt`` file parallelizes across tasks (unlike the per-document XML
    path).  Parsing is pure JVM regex (whole-stage codegen) for the
    overwhelming majority of lines; only lines containing ``\\`` escape
    sequences detour through an Arrow batch running the exact pure-Python
    parser — a row-level hybrid, unioned back together, no shuffle."""
    lines = (
        spark.read.format("text")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.concat(F.lit("file:"), F.col("_metadata.file_name"))
            .alias("context"),
            F.col("value").alias("line"))
        .filter((F.trim("line") != "") & ~F.trim("line").startswith("#"))
    )
    clean = lines.filter(~F.col("line").contains("\\"))
    dirty = lines.filter(F.col("line").contains("\\"))

    subj_tok = F.regexp_extract("line", _NT_LINE_JAVA, 1)
    pred_tok = F.regexp_extract("line", _NT_LINE_JAVA, 2)
    obj_tok = F.regexp_extract("line", _NT_LINE_JAVA, 3)
    lit_body = F.regexp_extract(obj_tok, _NT_LITERAL_JAVA, 1)
    lit_lang = F.nullif(F.regexp_extract(obj_tok, _NT_LITERAL_JAVA, 2), F.lit(""))
    strip_angle = lambda c: F.substring(c, 2, F.length(c) - 2)  # noqa: E731

    parsed_clean = clean.select(
        "context",
        F.when(subj_tok == "", F.lit(None))
        .when(subj_tok.startswith("<"), strip_angle(subj_tok))
        .otherwise(subj_tok).alias("subj"),
        F.when(pred_tok == "", F.lit(None))
        .otherwise(strip_angle(pred_tok)).alias("pred"),
        F.when(obj_tok == "", F.lit(None))
        .when(obj_tok.startswith("<"), strip_angle(obj_tok))
        .when(obj_tok.startswith("_:"), obj_tok)
        .otherwise(lit_body).alias("obj_value"),
        F.when(obj_tok == "", F.lit("error"))
        .when(obj_tok.startswith("<"), F.lit("uri"))
        .when(obj_tok.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(obj_tok.startswith('"'), lit_lang)
        .otherwise(F.lit(None).cast("string")).alias("obj_lang"),
        F.when(subj_tok == "",
               F.concat(F.lit("ValueError: malformed N-Triples line: "),
                        F.trim("line"))).alias("error"),
    )
    parsed_dirty = dirty.mapInPandas(
        _parse_nt_lines_python, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    triples = parsed_clean.unionByName(parsed_dirty)
    if keep_errors:
        return triples
    return triples.filter(F.col("error").isNull()).drop("error")


# Java-regex twin of rdfxml.nquads._LINE_RE: the N-Triples line grammar
# plus an optional 4th graph term (group 4) before the terminating dot.
_NQ_LINE_JAVA = (
    r'^\s*(<[^<>\s]*>|_:\S+)\s+(<[^<>\s]*>)\s+'
    r'(<[^<>\s]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^<>\s]*>)?)'
    r'(?:\s+(<[^<>\s]*>|_:\S+))?\s*\.\s*$')


def _parse_nq_lines_python(batches) -> Iterator:
    """mapInPandas worker for N-Quads lines carrying escape sequences:
    exact pure-Python parse (rdfxml.nquads); context = graph label."""
    import pandas as pd

    from ..model import node_to_row
    from ..rdfxml.nquads import parse_nquads_line

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}
        for line in batch["line"]:
            try:
                parsed = parse_nquads_line(line)
                if parsed is None:
                    continue
                graph, subj, pred, obj = parsed
                subj, pred, value, kind, lang = node_to_row(subj, pred, obj)
                row = (graph, subj, pred, value, kind, lang, None)
            except Exception as exc:
                row = (None, None, None, None, "error", None,
                       "%s: %s" % (type(exc).__name__, exc))
            for key, cell in zip(out, row):
                out[key].append(cell)
        yield pd.DataFrame(out)


def nquads_lines_to_quads(lines: DataFrame,
                          keep_errors: bool = False) -> DataFrame:
    """Parse a one-column (``line``) relation of N-Quads lines into the
    quad shape.  Pure transformations (JVM regex fast path + Arrow
    escape fallback), so it works identically on batch AND streaming
    DataFrames — ``streaming.quad_stream`` feeds it ``readStream``
    lines."""
    lines = lines.filter(
        (F.trim("line") != "") & ~F.trim("line").startswith("#"))
    clean = lines.filter(~F.col("line").contains("\\"))
    dirty = lines.filter(F.col("line").contains("\\"))

    subj_tok = F.regexp_extract("line", _NQ_LINE_JAVA, 1)
    pred_tok = F.regexp_extract("line", _NQ_LINE_JAVA, 2)
    obj_tok = F.regexp_extract("line", _NQ_LINE_JAVA, 3)
    graph_tok = F.regexp_extract("line", _NQ_LINE_JAVA, 4)
    lit_body = F.regexp_extract(obj_tok, _NT_LITERAL_JAVA, 1)
    lit_lang = F.nullif(F.regexp_extract(obj_tok, _NT_LITERAL_JAVA, 2), F.lit(""))
    strip_angle = lambda c: F.substring(c, 2, F.length(c) - 2)  # noqa: E731

    parsed_clean = clean.select(
        F.when(graph_tok == "", F.lit(None).cast("string"))
        .when(graph_tok.startswith("<"), strip_angle(graph_tok))
        .otherwise(graph_tok).alias("context"),
        F.when(subj_tok == "", F.lit(None))
        .when(subj_tok.startswith("<"), strip_angle(subj_tok))
        .otherwise(subj_tok).alias("subj"),
        F.when(pred_tok == "", F.lit(None))
        .otherwise(strip_angle(pred_tok)).alias("pred"),
        F.when(obj_tok == "", F.lit(None))
        .when(obj_tok.startswith("<"), strip_angle(obj_tok))
        .when(obj_tok.startswith("_:"), obj_tok)
        .otherwise(lit_body).alias("obj_value"),
        F.when(obj_tok == "", F.lit("error"))
        .when(obj_tok.startswith("<"), F.lit("uri"))
        .when(obj_tok.startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(obj_tok.startswith('"'), lit_lang)
        .otherwise(F.lit(None).cast("string")).alias("obj_lang"),
        F.when(subj_tok == "",
               F.concat(F.lit("ValueError: malformed N-Quads line: "),
                        F.trim("line"))).alias("error"),
    )
    parsed_dirty = dirty.mapInPandas(
        _parse_nq_lines_python, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    quads = parsed_clean.unionByName(parsed_dirty)
    if keep_errors:
        return quads
    return quads.filter(F.col("error").isNull()).drop("error")


def read_nquads_quads(spark: SparkSession, path: str,
                      keep_errors: bool = False,
                      glob: str = "*.nq") -> DataFrame:
    """N-Quads files -> quad DataFrame: ``context`` = the 4th (graph)
    term, NULL when absent = the default graph — exactly the quad-relation
    shape the SPARQL ``GRAPH`` / ``FROM NAMED`` support consumes
    (sparql/compiler.py: default graph = context-IS-NULL rows).

    Engine extension (the reference has no quad model; its per-file
    contexts, graphcomponent.py:80, are the nearest analogue).  Scale
    shape identical to ``read_ntriples_triples``: line-splittable
    ``spark.read.text`` scan, pure-JVM regex parse for escape-free lines,
    Arrow-batched exact-Python fallback for the rest, unioned back with
    no shuffle."""
    lines = (
        spark.read.format("text")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(F.col("value").alias("line")))
    return nquads_lines_to_quads(lines, keep_errors=keep_errors)


def _parse_turtle_documents(batches) -> Iterator:
    """mapInPandas worker: (context, ttl) batches -> triple rows.  Same
    per-document bnode rescoping discipline as ``_parse_documents``."""
    import pandas as pd

    from ..model import BNode
    from ..rdfxml.turtle import parse_turtle

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}

        def emit(context, subj, pred, value, kind, lang, error=None):
            out["context"].append(context)
            out["subj"].append(subj)
            out["pred"].append(pred)
            out["obj_value"].append(value)
            out["obj_kind"].append(kind)
            out["obj_lang"].append(lang)
            out["error"].append(error)

        for context, ttl in zip(batch["context"], batch["ttl"]):
            try:
                BNode.nextGenId = 0
                graph = parse_turtle(ttl)
                scope = "_:d" + _stable_hash(context)
                for s, p, o in graph.triples():
                    subj, pred, value, kind, lang = node_to_row(s, p, o)
                    if subj.startswith("_:"):
                        subj = scope + subj[1:]
                    if kind == "bnode":
                        value = scope + value[1:]
                    emit(context, subj, pred, value, kind, lang)
            except Exception as exc:  # quarantine, don't fail the job
                emit(context, None, None, None, "error", None,
                     "%s: %s" % (type(exc).__name__, exc))
        yield pd.DataFrame(out)


def read_turtle_triples(spark: SparkSession, path: str,
                        keep_errors: bool = False,
                        glob: str = "*.ttl") -> DataFrame:
    """Turtle files -> triples DataFrame (context = ``file:<basename>``).

    Scale shape: Turtle statements span lines (long strings, ``;``/``,``
    continuation), so unlike ``.nt`` a single document is NOT
    line-splittable — parallelism comes from the file count, one
    Arrow-batched ``mapInPandas`` task per batch of whole documents (the
    same shape as the RDF/XML path).  For bulk single-file interchange
    prefer ``.nt``; directory-of-``.ttl`` corpora parallelize
    embarrassingly here."""
    docs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.concat(F.lit("file:"),
                     F.element_at(F.split(F.col("path"), "/"), -1)
                     ).alias("context"),
            F.decode(F.col("content"), "utf-8").alias("ttl"))
    )
    triples = docs.mapInPandas(
        _parse_turtle_documents, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    if keep_errors:
        return triples
    return triples.filter(F.col("error").isNull()).drop("error")


def _parse_trig_documents(batches) -> Iterator:
    """mapInPandas worker: (context, trig) batches -> quad rows.  The
    graph label (rescoped when a bnode) replaces the file context in the
    output ``context`` column — NULL = default graph, the SPARQL quad
    shape.  Bnode rescoping discipline identical to the other formats,
    applied to graph labels too (bnode graph labels are document-scoped
    like any other bnode)."""
    import pandas as pd

    from ..model import BNode
    from ..rdfxml.trig import parse_trig

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}

        def emit(context, subj, pred, value, kind, lang, error=None):
            out["context"].append(context)
            out["subj"].append(subj)
            out["pred"].append(pred)
            out["obj_value"].append(value)
            out["obj_kind"].append(kind)
            out["obj_lang"].append(lang)
            out["error"].append(error)

        for file_ctx, trig in zip(batch["context"], batch["trig"]):
            try:
                BNode.nextGenId = 0
                quads = parse_trig(trig)
                scope = "_:d" + _stable_hash(file_ctx)
                for graph, s, p, o in quads:
                    subj, pred, value, kind, lang = node_to_row(s, p, o)
                    if graph is not None and graph.startswith("_:"):
                        graph = scope + graph[1:]
                    if subj.startswith("_:"):
                        subj = scope + subj[1:]
                    if kind == "bnode":
                        value = scope + value[1:]
                    emit(graph, subj, pred, value, kind, lang)
            except Exception as exc:  # quarantine, don't fail the job
                emit(file_ctx, None, None, None, "error", None,
                     "%s: %s" % (type(exc).__name__, exc))
        yield pd.DataFrame(out)


def read_trig_quads(spark: SparkSession, path: str,
                    keep_errors: bool = False,
                    glob: str = "*.trig") -> DataFrame:
    """TriG files -> quad DataFrame: ``context`` = the block's graph
    label, NULL = default graph — the SPARQL ``GRAPH``/``FROM NAMED``
    quad shape, same contract as ``read_nquads_quads``.

    Scale shape: like Turtle, TriG is not line-splittable (statements and
    graph blocks span lines), so parallelism comes from the file count —
    one Arrow-batched ``mapInPandas`` over whole documents.  For bulk
    single-file quad interchange prefer ``.nq``."""
    docs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.concat(F.lit("file:"),
                     F.element_at(F.split(F.col("path"), "/"), -1)
                     ).alias("context"),
            F.decode(F.col("content"), "utf-8").alias("trig"))
    )
    quads = docs.mapInPandas(
        _parse_trig_documents, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    if keep_errors:
        return quads
    return quads.filter(F.col("error").isNull()).drop("error")


def _parse_jsonld_documents(batches) -> Iterator:
    """mapInPandas worker: (context, jsonld) batches -> quad rows.  Graph
    labels (rescoped when bnodes) land in ``context``, NULL = default
    graph — same contract as the TriG worker."""
    import pandas as pd

    from ..model import BNode
    from ..rdfxml.jsonld import parse_jsonld_quads

    for batch in batches:
        out = {k: [] for k in ("context", "subj", "pred", "obj_value",
                               "obj_kind", "obj_lang", "error")}

        def emit(context, subj, pred, value, kind, lang, error=None):
            out["context"].append(context)
            out["subj"].append(subj)
            out["pred"].append(pred)
            out["obj_value"].append(value)
            out["obj_kind"].append(kind)
            out["obj_lang"].append(lang)
            out["error"].append(error)

        for file_ctx, text in zip(batch["context"], batch["jsonld"]):
            try:
                BNode.nextGenId = 0
                quads = parse_jsonld_quads(text)
                scope = "_:d" + _stable_hash(file_ctx)
                for graph, s, p, o in quads:
                    subj, pred, value, kind, lang = node_to_row(s, p, o)
                    if graph is not None and graph.startswith("_:"):
                        graph = scope + graph[1:]
                    if subj.startswith("_:"):
                        subj = scope + subj[1:]
                    if kind == "bnode":
                        value = scope + value[1:]
                    emit(graph, subj, pred, value, kind, lang)
            except Exception as exc:  # quarantine, don't fail the job
                emit(file_ctx, None, None, None, "error", None,
                     "%s: %s" % (type(exc).__name__, exc))
        yield pd.DataFrame(out)


def read_jsonld_quads(spark: SparkSession, path: str,
                      keep_errors: bool = False,
                      glob: str = "*.jsonld") -> DataFrame:
    """JSON-LD files -> quad DataFrame: ``context`` = the ``@graph``
    label under an ``@id`` (NULL = default graph) — the SPARQL
    ``GRAPH``/``FROM NAMED`` quad shape, same contract as
    ``read_trig_quads``.

    Scale shape: a JSON-LD document is one JSON value, so it is NOT
    line-splittable — parallelism comes from the file count, one
    Arrow-batched ``mapInPandas`` over whole documents.  The NDJSON
    shards ``sinks.jsonld_sink`` writes (one node object per line) go
    through the same path: the parser falls back to per-line decoding,
    so sharded corpora parallelize by shard file."""
    docs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.concat(F.lit("file:"),
                     F.element_at(F.split(F.col("path"), "/"), -1)
                     ).alias("context"),
            F.decode(F.col("content"), "utf-8").alias("jsonld"))
    )
    quads = docs.mapInPandas(
        _parse_jsonld_documents, schema=TRIPLE_WITH_CONTEXT_SCHEMA)
    if keep_errors:
        return quads
    return quads.filter(F.col("error").isNull()).drop("error")


def read_rdf_directory(spark: SparkSession, path: str,
                       keep_errors: bool = False) -> DataFrame:
    """Mixed-extension multi-source ingest (reference ``iterRdfSources``,
    graphcomponent.py:58-80): ``.rdf`` documents through the XML parser,
    ``.nt`` files through the line parser, ``.ttl`` documents through the
    Turtle parser, ``.nq``/``.trig``/``.jsonld`` through the quad
    parsers — one unified quad relation.  Triple formats carry per-file
    provenance contexts (``file:<basename>``); quad formats carry their
    intrinsic graph labels (NULL = default graph).  Both context flavors
    are named graphs to the SPARQL ``GRAPH`` machinery, so the union is
    directly queryable as a dataset."""
    return (
        read_rdfxml_triples(spark, path, keep_errors=keep_errors)
        .unionByName(read_ntriples_triples(spark, path,
                                           keep_errors=keep_errors))
        .unionByName(read_turtle_triples(spark, path,
                                         keep_errors=keep_errors))
        .unionByName(read_nquads_quads(spark, path,
                                       keep_errors=keep_errors))
        .unionByName(read_trig_quads(spark, path,
                                     keep_errors=keep_errors))
        .unionByName(read_jsonld_quads(spark, path,
                                       keep_errors=keep_errors)))


def file_sources(directory: str) -> list[tuple[str, str, str]]:
    """Local (non-Spark) directory walk mirroring the reference's
    ``iterRdfSources`` (graphcomponent.py:58-80): yields
    (context, content_type, payload) for ``.rdf``/``.nt`` files."""
    out = []
    for dirpath, _, filenames in os.walk(directory):
        for filename in sorted(filenames):
            full = os.path.join(dirpath, filename)
            if filename.endswith(".rdf"):
                content_type = "text/xml"
            elif filename.endswith(".nt"):
                content_type = "text/plain"
            elif filename.endswith(".ttl"):
                content_type = "text/turtle"
            else:
                raise ValueError("Unknown file format")
            with open(full, encoding="utf-8") as fh:
                out.append(("file:%s" % os.path.basename(full), content_type,
                            fh.read()))
    return out
