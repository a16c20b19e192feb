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
            else:
                raise ValueError("Unknown file format")
            with open(full, encoding="utf-8") as fh:
                out.append(("file:%s" % os.path.basename(full), content_type,
                            fh.read()))
    return out
