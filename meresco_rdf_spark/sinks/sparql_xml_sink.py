"""W3C SPARQL 1.1 Query Results XML encoder — the fourth and last
results format next to ``sparql_json_sink`` (JSON) and
``sparql_csv_sink`` (CSV/TSV).  The reference only DECODES result
bindings (rdf/uri.py:35-36 ``fromDict``); a query engine must also
produce the interchange formats.

Format (https://www.w3.org/TR/rdf-sparql-XMLres/): a ``<sparql>``
document with one ``<head>`` listing the variables and one
``<results>`` holding a ``<result>`` element per solution; each bound
variable is a ``<binding name="v">`` wrapping ``<uri>``, ``<bnode>``
or ``<literal [xml:lang=...]>``.  Unbound variables OMIT the binding
element.  ASK results replace ``<results>`` with ``<boolean>``.

Engine conventions shared with the JSON sink: bnode values keep their
``_:`` prefix (the reference's own label spelling, so the document
round-trips through ``sources.sparql_json``-style decoders), and
aggregate/computed scalar columns encode as plain literals.

Everything in the row path is JVM column expressions (``when`` /
``concat`` / chained ``replace`` for the XML escapes); at scale the
``<result>`` fragments stream out as text shards (``df.write.text``)
between a driver-written prolog/epilog — no collect, no Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .sparql_csv_sink import _term_cols
from .sparql_json_sink import solution_variables

SPARQL_NS = "http://www.w3.org/2005/sparql-results#"


def _xml_text(value: Column) -> Column:
    """Escape character data (& first, then the angle brackets)."""
    esc = F.replace(value, F.lit("&"), F.lit("&amp;"))
    esc = F.replace(esc, F.lit("<"), F.lit("&lt;"))
    return F.replace(esc, F.lit(">"), F.lit("&gt;"))


def _xml_attr(value: Column) -> Column:
    """Escape an attribute value (text escapes + the quote)."""
    return F.replace(_xml_text(value), F.lit('"'), F.lit("&quot;"))


def encode_xml(df: DataFrame, variables: Optional[Sequence[str]] = None,
               out_col: str = "xml_line") -> DataFrame:
    """Solution frame -> one ``<result>...</result>`` fragment per row
    (single line; the text writer supplies newlines, ``xml_prolog`` /
    ``XML_EPILOG`` supply the document shell)."""
    if variables is None:
        variables = solution_variables(df)
        if not variables:
            raise ValueError("no solution variables found")
    parts: List[Column] = [F.lit("<result>")]
    for v in variables:
        value, kind, lang = _term_cols(df, v)
        text = _xml_text(value)
        literal = F.when(
            lang.isNotNull(),
            F.concat(F.lit('<literal xml:lang="'), _xml_attr(lang),
                     F.lit('">'), text, F.lit("</literal>"))
        ).otherwise(F.concat(F.lit("<literal>"), text,
                             F.lit("</literal>")))
        term = (F.when(kind == "uri",
                       F.concat(F.lit("<uri>"), text, F.lit("</uri>")))
                .when(kind == "bnode",
                      F.concat(F.lit("<bnode>"), text, F.lit("</bnode>")))
                .when(kind.isNotNull(), literal))
        binding = F.when(
            kind.isNotNull(),
            F.concat(F.lit('<binding name="'), F.lit(v), F.lit('">'),
                     term, F.lit("</binding>")))
        parts.append(F.coalesce(binding, F.lit("")))
    parts.append(F.lit("</result>"))
    return df.select(F.concat(*parts).alias(out_col))


def xml_prolog(variables: Sequence[str]) -> str:
    """Document head up to and including ``<results>`` (written once by
    the driver before the fragment shards)."""
    head = "".join('<variable name="%s"/>' % v for v in variables)
    return ('<?xml version="1.0"?>\n<sparql xmlns="%s"><head>%s</head>'
            "<results>" % (SPARQL_NS, head))


XML_EPILOG = "</results></sparql>"


def results_xml(df: DataFrame,
                variables: Optional[Sequence[str]] = None) -> str:
    """TEST-SCALE helper: the full results document as one string.  At
    scale use ``encode_xml(...).write.text(...)`` between
    ``xml_prolog`` and ``XML_EPILOG``."""
    if variables is None:
        variables = solution_variables(df)
    rows = [r[0] for r in encode_xml(df, variables).collect()]
    return xml_prolog(variables) + "".join(rows) + XML_EPILOG


def boolean_xml(value: bool) -> str:
    """The ASK-result document (no solutions, one ``<boolean>``)."""
    return ('<?xml version="1.0"?>\n<sparql xmlns="%s"><head/>'
            "<boolean>%s</boolean></sparql>"
            % (SPARQL_NS, "true" if value else "false"))
