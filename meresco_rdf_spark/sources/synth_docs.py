"""Deterministic synthetic document corpus for dedup benchmarks/tests.

Pure JVM column expressions over ``spark.range`` — no Python in the
generation path, so corpus synthesis never bottlenecks the operator
being measured.  Same (n_docs, words_per_doc, vocab) -> same corpus,
independent of partitioning or parallelism (every word derives from
``xxhash64(group_id, position)`` only).

Duplicate structure (by ``pmod(xxhash64(doc_id, 'dup'), 10)``):

- lane 0-1 (~20%%): EXACT duplicate of the doc's group head
  (``group = floor(doc_id / 10) * 10``) — same text byte-for-byte;
- lane 2   (~10%%): NEAR duplicate — group head's text plus one extra
  trailing word (word-shingle Jaccard just below 1);
- lanes 3-9        : unique text seeded by the doc's own id.

Group heads (doc_id %% 10 == 0) always generate from their own id, so
every dup lane points at real text and the expected cluster canonical
is the (min-id) group head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def synthesize_documents(spark: SparkSession, n_docs: int,
                         words_per_doc: int = 30, vocab: int = 5000,
                         partitions: int | None = None) -> DataFrame:
    """``(doc_id long, text string)`` with planted exact + near dups."""
    base = spark.range(0, n_docs, 1, partitions) if partitions else \
        spark.range(n_docs)
    group = (F.floor(F.col("id") / 10) * 10).cast("long")
    lane = F.pmod(F.xxhash64(F.col("id"), F.lit("dup")), F.lit(10))
    is_head = F.col("id") % 10 == 0
    seed = F.when(is_head | (lane >= 3), F.col("id")).otherwise(group)

    def words_from(seed_col):
        return F.transform(
            F.sequence(F.lit(1), F.lit(words_per_doc)),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(seed_col, j), F.lit(vocab)).cast("string")))

    text = F.array_join(words_from(seed), " ")
    near_extra = F.concat(
        F.lit(" w"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("extra")), F.lit(vocab))
        .cast("string"))
    text = F.when(~is_head & (lane == 2), F.concat(text, near_extra)) \
        .otherwise(text)
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))
