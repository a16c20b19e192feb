"""VoID dataset statistics (W3C Vocabulary of Interlinked Datasets).

The standard self-description a published RDF dataset ships alongside
its data: how many triples, entities, classes, properties, and the
per-predicate / per-class partition breakdowns.  Engine extension —
the publish-metadata step of a KG pipeline (void.adoc §4.2-4.6 shapes).

Emitted as TRIPLES (the VoID description is itself RDF), so the result
feeds straight into the repo's serializers/SPARQL like any other graph:

- ``void:triples`` / ``void:entities`` (distinct URI subjects) /
  ``void:distinctSubjects`` / ``void:distinctObjects`` /
  ``void:classes`` / ``void:properties`` on the dataset node;
- one ``void:propertyPartition`` bnode per predicate carrying
  ``void:property`` + ``void:triples``;
- one ``void:classPartition`` bnode per class carrying ``void:class``
  + ``void:entities``.

Counts are emitted as plain literals (stringified BIGINTs — the
reference's untyped literal model, SURVEY §1.2).

Scale shape: one pass for the global counts (a single aggregate with
five partial-aggregatable distinct counts — Catalyst plans one expand
+ partial/final pair), one ``groupBy(pred)`` and one class-slice
``groupBy(obj_value)`` for the partitions — three aggregations total,
each map-side combined; partition bnode labels derive from the
predicate/class IRI (deterministic, collision-free by construction),
so the output is value-hash stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOID = "http://rdfs.org/ns/void#"


def _lit(pred: str, value_col) -> list:
    return [F.lit(VOID + pred).alias("pred"),
            value_col.cast("string").alias("obj_value"),
            F.lit("literal").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang")]


def void_description(triples: DataFrame,
                     dataset_uri: str = "urn:void:dataset") -> DataFrame:
    """VoID description triples for a 5-column triple relation."""
    spark = triples.sparkSession
    ds = F.lit(dataset_uri).alias("subj")

    totals = triples.agg(
        F.count("*").alias("n"),
        F.countDistinct("subj").alias("ds"),
        F.countDistinct("obj_value").alias("do"),
        F.countDistinct("pred").alias("np"),
        F.countDistinct(F.when(F.col("pred") == RDF_TYPE,
                               F.col("obj_value"))).alias("nc"),
        F.countDistinct(F.when(~F.col("subj").startswith("_:"),
                               F.col("subj"))).alias("ne"))
    global_rows = []
    for pred, col in (("triples", "n"), ("distinctSubjects", "ds"),
                      ("distinctObjects", "do"), ("properties", "np"),
                      ("classes", "nc"), ("entities", "ne")):
        global_rows.append(totals.select(ds, *_lit(pred, F.col(col))))

    pp = (triples.groupBy("pred").agg(F.count("*").alias("n"))
          .withColumn("part", F.concat(F.lit("_:pp-"), F.md5("pred"))))
    prop_parts = (
        pp.select(ds, F.lit(VOID + "propertyPartition").alias("pred"),
                  F.col("part").alias("obj_value"),
                  F.lit("bnode").alias("obj_kind"),
                  F.lit(None).cast("string").alias("obj_lang"))
        .unionByName(pp.select(
            F.col("part").alias("subj"),
            F.lit(VOID + "property").alias("pred"),
            F.col("pred").alias("obj_value"),
            F.lit("uri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang")))
        .unionByName(pp.select(F.col("part").alias("subj"),
                               *_lit("triples", F.col("n")))))

    cp = (triples.filter(F.col("pred") == RDF_TYPE)
          .groupBy("obj_value").agg(F.countDistinct("subj").alias("n"))
          .withColumn("part", F.concat(F.lit("_:cp-"),
                                       F.md5("obj_value"))))
    class_parts = (
        cp.select(ds, F.lit(VOID + "classPartition").alias("pred"),
                  F.col("part").alias("obj_value"),
                  F.lit("bnode").alias("obj_kind"),
                  F.lit(None).cast("string").alias("obj_lang"))
        .unionByName(cp.select(
            F.col("part").alias("subj"),
            F.lit(VOID + "class").alias("pred"),
            F.col("obj_value").alias("obj_value"),
            F.lit("uri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang")))
        .unionByName(cp.select(F.col("part").alias("subj"),
                               *_lit("entities", F.col("n")))))

    out = global_rows[0]
    for part in global_rows[1:] + [prop_parts, class_parts]:
        out = out.unionByName(part)
    return out
