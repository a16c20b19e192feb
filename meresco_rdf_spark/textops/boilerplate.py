"""Boilerplate line removal: per-source frequent-line detection and
stripping.

The training-data cleaning step between raw scrape and dedup (the
CCNet / RefinedWeb recipe): lines that recur across many documents of
the same source (navigation, headers, footers, cookie banners) carry no
signal and poison n-gram dedup.  Engine extension — the reference has
no document operators; part of the prompt-mandated text-analysis set
alongside ``textops/textstats.py``.

Scale shape:

- ``boilerplate_lines`` (detection): one ``explode`` of the line split,
  then ONE aggregation — ``groupBy(source, line)`` with a distinct-doc
  count (Catalyst plans the distinct as a partial/expand aggregation,
  so hot lines combine map-side).  The per-source document totals ride
  a second, catalog-sized aggregation over the docs relation.  The
  threshold compare is INTEGER (``n * 100 > pct * n_docs``) so the
  boundary is bit-identical across engines — no float ratio.
- ``strip_boilerplate``: the detected set is grouped into one
  per-source array and BROADCAST onto the corpus — boilerplate sets are
  control-plane-sized by construction (a line must recur in more than
  ``max_doc_pct``% of a source's documents to qualify; a source has few
  such lines).  The strip itself is pure JVM array algebra on the text
  column — ``split`` / ``filter`` / ``array_join`` — no explode, no
  second pass over the corpus, line order and empty lines preserved.

Matching is on the TRIMMED line form (leading/trailing whitespace does
not defeat detection), while the surviving document text keeps its
original lines verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def boilerplate_lines(docs: DataFrame, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 2,
                      max_doc_pct: int = 50) -> DataFrame:
    """Lines appearing in more than ``max_doc_pct`` percent (strictly)
    of a source's documents, and in at least ``min_docs`` of them.

    A line repeated inside ONE document counts once (distinct-doc
    semantics); empty-after-trim lines are never boilerplate.  Returns
    ``(group, line, n, n_docs)`` with ``line`` trimmed.
    """
    if not 0 <= max_doc_pct <= 100:
        raise ValueError("max_doc_pct must be in [0, 100]")
    lines = (docs.select(F.col(group_col).alias("group"),
                         F.col(id_col).alias("doc"),
                         F.explode(F.split(F.col(text_col), "\n"))
                         .alias("raw"))
             .select("group", "doc", F.trim("raw").alias("line"))
             .filter(F.col("line") != ""))
    counts = (lines.groupBy("group", "line")
              .agg(F.countDistinct("doc").alias("n")))
    totals = (docs.groupBy(F.col(group_col).alias("group"))
              .agg(F.countDistinct(id_col).alias("n_docs")))
    return (counts.join(totals, "group")
            .filter((F.col("n") >= min_docs)
                    & (F.col("n") * 100 > max_doc_pct * F.col("n_docs")))
            .select("group", "line", "n", "n_docs"))


def strip_boilerplate(docs: DataFrame, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      min_docs: int = 2, max_doc_pct: int = 50,
                      boiler: DataFrame | None = None) -> DataFrame:
    """Remove each source's boilerplate lines from its documents.

    ``boiler`` — optional precomputed ``boilerplate_lines`` result (so
    detection over a sample can strip the full corpus — the 100-TB
    recipe); defaults to detecting over ``docs`` itself.

    The surviving text keeps original line content, order, and empty
    lines; only lines whose trimmed form is in the source's boilerplate
    set are dropped.  Schema is preserved (``text_col`` replaced).
    """
    if boiler is None:
        boiler = boilerplate_lines(docs, group_col, id_col, text_col,
                                   min_docs, max_doc_pct)
    per_group = (boiler.groupBy(F.col("group").alias(group_col))
                 .agg(F.collect_list("line").alias("_blines")))
    cleaned = F.array_join(
        F.filter(F.split(F.col(text_col), "\n"),
                 lambda x: ~F.coalesce(
                     F.array_contains(F.col("_blines"), F.trim(x)),
                     F.lit(False))),
        "\n")
    return (docs.join(F.broadcast(per_group), group_col, "left")
            .withColumn(text_col, cleaned)
            .select(*docs.columns))
