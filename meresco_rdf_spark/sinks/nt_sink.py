"""N-Triples egress: triples DataFrame -> ``.nt`` lines / files.

The write-side twin of ``sources.rdf_source.read_ntriples_triples``.
Unlike the RDF/XML sink (which needs a per-shard Python serializer for
fixture byte-parity), N-Triples is line-oriented: the whole encoding is
pure column expressions — whole-stage codegen, zero Python, and the
output is splittable on read.  This makes ``.nt`` the preferred bulk
interchange format at scale; RDF/XML shards remain for reference
fixture parity.

Escapes: ``\\ \" \\n \\r \\t`` (backslash first).  Non-ASCII stays raw
UTF-8 (valid N-Triples 1.1).  Language tags follow literals as ``@lang``;
bnode labels pass through verbatim; datatypes don't exist in the
reference literal model so none are written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def nt_escape(col: Column) -> Column:
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def ntriples_line(subj: Column, pred: Column, obj_value: Column,
                  obj_kind: Column, obj_lang: Column) -> Column:
    subj_tok = F.when(subj.startswith("_:"), subj).otherwise(
        F.concat(F.lit("<"), nt_escape(subj), F.lit(">")))
    pred_tok = F.concat(F.lit("<"), nt_escape(pred), F.lit(">"))
    obj_tok = (
        F.when(obj_kind == "uri",
               F.concat(F.lit("<"), nt_escape(obj_value), F.lit(">")))
        .when(obj_kind == "bnode", obj_value)
        .otherwise(F.concat(
            F.lit('"'), nt_escape(obj_value), F.lit('"'),
            F.when(obj_lang.isNotNull(), F.concat(F.lit("@"), obj_lang))
            .otherwise(F.lit(""))))
    )
    return F.concat_ws(" ", subj_tok, pred_tok, obj_tok, F.lit("."))


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Triples -> one-column (``value``) DataFrame of N-Triples lines."""
    return triples.select(
        ntriples_line(
            F.col("subj"), F.col("pred"), F.col("obj_value"),
            F.col("obj_kind"), F.col("obj_lang")).alias("value"))


def write_ntriples(triples: DataFrame, path: str,
                   num_files: int | None = None,
                   mode: str = "overwrite") -> None:
    """Materialize as ``.nt`` text files (one line per triple).  The
    files are line-splittable, so a downstream ``spark.read.text`` scan
    parallelizes regardless of file count."""
    lines = ntriples_lines(triples)
    if num_files:
        lines = lines.repartition(num_files)
    lines.write.mode(mode).option("compression", "none").text(path)
