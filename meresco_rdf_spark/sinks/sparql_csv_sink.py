"""W3C SPARQL 1.1 Query Results CSV and TSV encoders — completing the
results-format matrix next to ``sparql_json_sink`` (the reference only
DECODES result bindings, rdf/uri.py:35-36; an engine must produce the
interchange formats too).

Both encoders are pure JVM column expressions (``when`` / ``concat`` /
``regexp_replace``); at scale the lines stream out as text shards
(``df.write.text``) under a driver-written header line — no collect,
no Python in the row path.

CSV (https://www.w3.org/TR/sparql11-results-csv-tsv/ §3): one header
line of variable names without ``?``; each term is its RAW string —
IRI without angle brackets, literal lexical form, bnode with its
``_:`` label; RFC 4180 quoting only when the value contains a quote,
comma, CR or LF (internal quotes doubled).  Unbound -> empty field.

TSV (§4): header keeps the ``?``; terms in full SPARQL syntax —
``<iri>``, ``_:label``, ``"literal"`` with backslash escapes
(``\\ \t \n \r \"``) and ``@lang`` appended.  Numeric aggregate
columns are emitted bare (legal xsd-numeric shorthand); other scalar
columns are plain literals.  Unbound -> empty field.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from .sparql_json_sink import solution_variables

_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float",
                     "double", "decimal")


def _term_cols(df: DataFrame, v: str) -> Tuple[Column, Column, Column]:
    """(value, kind, lang) columns for a solution variable; scalar
    (aggregate/computed) columns synthesize kind from nullness."""
    cols = set(df.columns)
    if "%s_kind" % v in cols and "%s_lang" % v in cols:
        return (F.col(v).cast("string"), F.col("%s_kind" % v),
                F.col("%s_lang" % v))
    kind = F.when(F.col(v).isNotNull(), F.lit("literal"))
    return F.col(v).cast("string"), kind, F.lit(None).cast("string")


def _csv_field(value: Column) -> Column:
    quoted = F.concat(F.lit('"'),
                      F.regexp_replace(value, '"', '""'), F.lit('"'))
    return F.coalesce(
        F.when(value.rlike('[",\r\n]'), quoted).otherwise(value),
        F.lit(""))


def _tsv_literal(value: Column, lang: Column) -> Column:
    esc = value
    for raw, escaped in (("\\", "\\\\"), ("\t", "\\t"), ("\n", "\\n"),
                         ("\r", "\\r"), ('"', '\\"')):
        esc = F.replace(esc, F.lit(raw), F.lit(escaped))
    body = F.concat(F.lit('"'), esc, F.lit('"'))
    return F.when(lang.isNotNull(),
                  F.concat(body, F.lit("@"), lang)).otherwise(body)


def _is_numeric(df: DataFrame, v: str) -> bool:
    dtype = dict(df.dtypes).get(v, "")
    return dtype.startswith(_NUMERIC_PREFIXES)


def encode_csv(df: DataFrame, variables: Optional[Sequence[str]] = None,
               out_col: str = "csv_line") -> DataFrame:
    """Solution frame -> one CSV data line per row (no EOL; the text
    writer supplies newlines, ``csv_header`` supplies the head)."""
    if variables is None:
        variables = solution_variables(df)
    fields = []
    for v in variables:
        value, _kind, _lang = _term_cols(df, v)
        fields.append(_csv_field(value))
    return df.select(F.concat_ws(",", *fields).alias(out_col))


def csv_header(variables: Sequence[str]) -> str:
    return ",".join(variables)


def encode_tsv(df: DataFrame, variables: Optional[Sequence[str]] = None,
               out_col: str = "tsv_line") -> DataFrame:
    """Solution frame -> one TSV data line per row (terms in SPARQL
    syntax)."""
    if variables is None:
        variables = solution_variables(df)
    fields = []
    for v in variables:
        value, kind, lang = _term_cols(df, v)
        if "%s_kind" % v not in df.columns and _is_numeric(df, v):
            term = value  # bare numeric literal (§4)
        else:
            term = (
                F.when(kind == "uri",
                       F.concat(F.lit("<"), value, F.lit(">")))
                .when(kind == "bnode", value)
                .when(kind.isNotNull(), _tsv_literal(value, lang)))
        fields.append(F.coalesce(term, F.lit("")))
    return df.select(F.concat_ws("\t", *fields).alias(out_col))


def tsv_header(variables: Sequence[str]) -> str:
    return "\t".join("?%s" % v for v in variables)


def results_csv(df: DataFrame,
                variables: Optional[Sequence[str]] = None) -> str:
    """TEST-SCALE helper: the full CSV document as one string (CRLF
    line ends per RFC 4180).  At scale use ``encode_csv(...).write
    .text(...)`` + ``csv_header``."""
    if variables is None:
        variables = solution_variables(df)
    rows: List[str] = [r[0] for r in encode_csv(df, variables).collect()]
    return "\r\n".join([csv_header(variables)] + rows) + "\r\n"


def results_tsv(df: DataFrame,
                variables: Optional[Sequence[str]] = None) -> str:
    """TEST-SCALE helper: the full TSV document as one string."""
    if variables is None:
        variables = solution_variables(df)
    rows: List[str] = [r[0] for r in encode_tsv(df, variables).collect()]
    return "\n".join([tsv_header(variables)] + rows) + "\n"
