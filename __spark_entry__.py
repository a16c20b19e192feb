"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction slice on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data operators.  Every query carries an
oracle: ANSI-SQL ones run directly against the parquet views; the
non-SQL-expressible KG-pipeline/streaming queries are hash-compared to
committed golden parquet produced by an independent pure-Python
reference pipeline (tools/golden_ref.py, regenerated + cross-checked by
tools/make_golden.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG construction end-to-end + graph analytics.

    Builds the triples relation two ways — (a) the KG pipeline over
    deterministic synthetic transcripts (mention detection -> triple
    emission -> MinHash canonicalization), (b) the triples view derived
    from the sf0.001 TPC-H-ish tables — unions them, and resolves
    per-subject priority labels joined with referrer in-degrees.
    """
    from meresco_rdf_spark.entry_queries import tpch_triples
    from meresco_rdf_spark.kg.pipeline import run_pipeline
    from meresco_rdf_spark.operators.graph_ops import find_labels, in_degrees
    from meresco_rdf_spark.session import ship_package
    from meresco_rdf_spark.sources.transcripts import synthesize_transcripts

    ship_package(spark)
    sf_dir = "/root/testdata/sf0.001"
    kg = run_pipeline(synthesize_transcripts(spark, 100, 8)).triples
    triples = kg.unionByName(tpch_triples(spark, sf_dir))
    labels = find_labels(triples)
    degrees = in_degrees(triples).withColumnRenamed("obj_value", "subj")
    return (
        labels.join(degrees.filter(F.col("obj_kind") == "uri").drop("obj_kind"),
                    "subj", "left")
        .select("subj", "label_value", "label_lang",
                F.coalesce(F.col("in_degree"), F.lit(0)).alias("in_degree"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from meresco_rdf_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from meresco_rdf_spark.session import ship_package

            ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from meresco_rdf_spark.entry_queries import ORACLES

    return dict(ORACLES)
