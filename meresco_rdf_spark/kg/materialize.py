"""Output materialization: subject-partitioned triple + adjacency tables.

North_star step (d).  Layout decisions, stated for the 100 TB case:

- **triple table**: parquet (Iceberg layout-compatible; the catalog jar is
  not in this sandbox, so we implement the same physical design —
  ``subj_bucket = pmod(xxhash64(subj), N)`` as a partition column — which
  is exactly what an Iceberg ``bucket(N, subj)`` partition transform
  computes).  Subject point-lookups prune to 1/N of the files; rows are
  sorted within partitions by (subj, pred, obj_value) so parquet row-group
  min/max stats prune within files too.
- **adjacency table**: one row per subject with a sorted array of
  (pred, obj_value, obj_kind, obj_lang) structs — the "gather the
  resource description" access path the reference serializer walks
  (triples2rdfxml.py:79-104) without an N-way shuffle per query.
- both writes flow through ``bucketed`` partitioning; re-running a bucket
  overwrites only that bucket (dynamic partition overwrite), which is what
  makes the checkpoint/resume unit a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_SORT = ["subj", "pred", "obj_value", "obj_kind", "obj_lang"]


def with_subj_bucket(triples: DataFrame, buckets: int = 64) -> DataFrame:
    """Add the Iceberg-style bucket partition column."""
    return triples.withColumn(
        "subj_bucket", F.pmod(F.xxhash64(F.col("subj")), F.lit(buckets)).cast("int"))


def write_triple_table(triples: DataFrame, path: str, buckets: int = 64,
                       mode: str = "overwrite") -> None:
    """Subject-bucketed, within-partition-sorted triple table."""
    (
        with_subj_bucket(triples, buckets)
        .repartition(buckets, "subj_bucket")
        .sortWithinPartitions(*TRIPLE_SORT)
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )


def adjacency(triples: DataFrame) -> DataFrame:
    """Per-subject adjacency: sorted struct array + degree.

    One hash-agg keyed subj (partial map-side combine; the sort is
    per-array, executed inside the agg output projection)."""
    edge = F.struct(
        F.col("pred"), F.col("obj_value"), F.col("obj_kind"), F.col("obj_lang"))
    return (
        triples.groupBy("subj")
        .agg(F.sort_array(F.collect_list(edge)).alias("edges"))
        .withColumn("degree", F.size(F.col("edges")))
    )


def write_adjacency_table(triples: DataFrame, path: str, buckets: int = 64,
                          mode: str = "overwrite") -> None:
    (
        with_subj_bucket(adjacency(triples), buckets)
        .repartition(buckets, "subj_bucket")
        .sortWithinPartitions("subj")
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )
