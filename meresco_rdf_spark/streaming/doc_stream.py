"""Streaming ingestion-time dedup for document corpora.

The batch dedup operators (textops/dedup.py) decide over a corpus that
already landed; this is the complementary shape a training-data intake
actually wants: documents arrive as a stream and exact duplicates are
dropped AT INGESTION, before they cost storage or downstream compute.

``stream_exact_dedup`` is Spark's stateful streaming ``dropDuplicates``
keyed on the normalized-text fingerprint (same md5-of-normalized key as
the batch :func:`..textops.dedup.exact_dedup`, so batch and stream
agree on WHICH texts are duplicates).  Semantics differ from batch in
exactly one documented way: batch keeps the min-id doc of each
fingerprint group, the stream keeps the FIRST-SEEN doc — at ingestion
time first-seen is the only coherent choice (later arrivals are the
duplicates).  Cluster membership (the set of surviving fingerprints) is
identical; the batch-equivalence test asserts that.

Scale: state is one entry per DISTINCT fingerprint — O(unique docs),
hash-partitioned by key across executors like any streaming state.  For
unbounded retention pass ``watermark=None`` (exact forever, state grows
with unique corpus); at 100-TB intake pass an event-time watermark so
state ages out: dedup then only guarantees uniqueness within the
watermark horizon (``dropDuplicatesWithinWatermark``), which is the
standard bounded-state trade.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

DOCUMENT_SCHEMA = StructType([
    StructField("doc_id", LongType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: Optional[int] = None
                         ) -> DataFrame:
    """File-drop stream of document parquet shards (schema pinned: a
    streaming source cannot infer).  ``max_files_per_trigger`` forces
    multi-micro-batch processing in tests."""
    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_exact_dedup(docs: DataFrame, text_col: str = "text",
                       watermark_col: Optional[str] = None,
                       watermark: str = "1 hour") -> DataFrame:
    """First-seen-wins exact dedup across micro-batches.

    Returns the input rows plus the ``fp`` key column; only the first
    document ever seen per fingerprint is emitted.  With
    ``watermark_col`` set, uses ``dropDuplicatesWithinWatermark`` so
    state is bounded by the watermark horizon (the 100-TB intake mode);
    without it, state is exact and O(distinct fingerprints)."""
    from ..textops.textstats import fingerprint

    keyed = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if watermark_col is not None:
        return (keyed.withWatermark(watermark_col, watermark)
                .dropDuplicatesWithinWatermark(["fp"]))
    return keyed.dropDuplicates(["fp"])
