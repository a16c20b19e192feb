"""Plan-property regression tests: the scale characteristics asserted in
CI so they can't silently regress (pushdown, pruning, single-shuffle
aggregation, broadcast joins, partial aggregation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from meresco_rdf_spark.entry_queries import (
    q_pricing_summary,
    tpch_triples,
)
from meresco_rdf_spark.operators.graph_ops import find_labels, match_patterns
from meresco_rdf_spark.plans import (
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

SF_DIR = "/root/testdata/sf0.001"


class TestPlanProperties:
    def test_masked_scan_pushes_filters_and_prunes_columns(self, spark):
        docs = spark.read.parquet("%s/documents.parquet" % SF_DIR)
        df = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
        filters = pushed_filters(df)
        assert any("EqualTo(lang,en)" in f for f in filters)
        scans = read_schema_columns(df)
        assert scans and "text" not in scans[0]  # widest column pruned

    def test_find_labels_is_single_shuffle_partial_agg(self, spark):
        labels = find_labels(tpch_triples(spark, SF_DIR))
        assert shuffle_count(labels) == 1
        assert has_partial_aggregation(labels)
        assert "Window" not in labels._jdf.queryExecution(
        ).executedPlan().toString()

    def test_bgp_uses_broadcast_join_under_aqe(self, spark):
        bgp = match_patterns(tpch_triples(spark, SF_DIR), [
            ("?c", "urn:rel:nation", "?n"),
            ("?n", "urn:rel:region", "?r"),
        ])
        bgp.count()  # let AQE finalize join strategies
        assert has_broadcast_join(bgp)

    def test_pricing_summary_partial_agg_one_shuffle(self, spark):
        q1 = q_pricing_summary(spark, SF_DIR)
        assert has_partial_aggregation(q1)
        assert shuffle_count(q1) == 1
