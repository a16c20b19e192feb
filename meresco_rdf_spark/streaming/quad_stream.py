"""Streaming N-Quads ingestion: ``.nq`` file drops -> quad relation ->
exactly-once MERGE into a parquet quad table.

The batch ``.nq`` parse (``sources.rdf_source.nquads_lines_to_quads``)
is pure column expressions plus an Arrow fallback — both legal on
streaming DataFrames — so the SAME parser runs over ``readStream``
lines: no second implementation, batch/stream parity by construction.

The table writer is a replay-idempotent ``foreachBatch`` MERGE: each
micro-batch is deduplicated, anti-joined (null-safe, full 6-column quad
key — the default graph is a NULL context) against the current table
state, and only genuinely-new quads are appended.  A micro-batch
re-delivered after a failure re-appends nothing, so checkpoint +
anti-join give exactly-once TABLE state on top of at-least-once batch
delivery — the same discipline as
``transcript_stream.run_merge_to_triple_table``.

Scale shape: the anti-join's streaming side is one micro-batch (small);
AQE broadcasts it against the table scan.  State is carried by the
table itself, not the streaming state store — O(0) executor state, no
watermark needed for set semantics.
"""

from __future__ import annotations

from typing import Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

QUAD_COLS = ["context", "subj", "pred", "obj_value", "obj_kind",
             "obj_lang"]


def read_nquads_stream(spark: SparkSession, path: str,
                       glob: str = "*.nq",
                       max_files_per_trigger: Optional[int] = None
                       ) -> DataFrame:
    """Directory of ``.nq`` files as a STREAMING quad relation (context
    = graph term, NULL = default graph)."""
    from ..sources.rdf_source import nquads_lines_to_quads

    reader = (spark.readStream.format("text")
              .option("pathGlobFilter", glob)
              .option("recursiveFileLookup", "true"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    lines = reader.load(path).select(F.col("value").alias("line"))
    return nquads_lines_to_quads(lines)


def run_nquads_to_quad_table(quads: DataFrame, table_path: str,
                             checkpoint: str):
    """Start the exactly-once quad-table MERGE; returns the streaming
    query (``availableNow`` trigger: drains everything currently in the
    source, then stops — the resumable-batch shape)."""
    spark = quads.sparkSession

    def merge(batch: DataFrame, batch_id: int) -> None:
        fresh = batch.select(*QUAD_COLS).dropDuplicates(QUAD_COLS)
        try:
            current = spark.read.parquet(table_path)
            cond = None
            for c in QUAD_COLS:
                eq = fresh[c].eqNullSafe(current[c])
                cond = eq if cond is None else cond & eq
            fresh = fresh.join(current, cond, "left_anti")
        except AnalysisException:  # first batch: no table yet
            pass  # (real read errors — corrupt files etc. — propagate)
        fresh.write.mode("append").parquet(table_path)

    return (quads.writeStream.foreachBatch(merge)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
