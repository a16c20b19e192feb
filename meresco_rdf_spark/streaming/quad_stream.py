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


# --------------------------------------------------------------------------
# incremental per-graph content hashes (exactly-once, two tables)
# --------------------------------------------------------------------------

HASH_COLS = ["graph", "n_triples", "content_hash"]


def run_nquads_with_graph_hashes(quads: DataFrame, table_path: str,
                                 hash_root: str, checkpoint: str):
    """Quad-table ingest PLUS transactionally consistent per-graph
    content fingerprints, maintained incrementally.

    The XOR fold of ``kg.fingerprint.graph_content_hashes`` distributes
    over disjoint unions, so set-inserts maintain it exactly: fold the
    genuinely-new rows of each micro-batch into the running state —
    never rescan the table.  The subtle part is keeping TWO tables
    (quads + hashes) exactly-once under replays and crashes; appending
    to one and then updating the other leaves a drift window whichever
    order is chosen.  Protocol (per micro-batch):

    1. stage: the batch's novel rows (dedup + null-safe anti-join
       against every OTHER batch directory — partition pruning makes
       the self-exclusion free) are written to an immutable
       ``batch=<id>`` directory.  A replayed batch finds the completed
       directory and REUSES it instead of recomputing — recomputation
       after a partial append would see its own rows and stage a loss.
    2. fold: the per-graph delta of the staged rows merges into the
       hash state (full outer join; counts add, hashes XOR) written as
       a NEW immutable version directory.
    3. commit: a ``_meta/v<N>.json`` manifest recording ``batch_id``
       is renamed into place — the rename IS the commit (the
       ``kg.snapshots`` discipline).  A batch whose id is <= the
       committed manifest's skips the fold; a crash after staging but
       before commit replays into step 2 from the staged directory.

    Readers see the quad table as the union of completed batch
    directories and the hash table through ``read_graph_hashes`` (the
    latest committed manifest only — a half-written version directory
    without its manifest is invisible).
    """
    import json as _json

    from ..kg.fingerprint import graph_content_hashes
    from ..kg.snapshots import _fs

    spark = quads.sparkSession

    def versions(fs, hpath):
        meta = hpath("%s/_meta" % hash_root)
        if not fs.exists(meta):
            return []
        out = []
        for st in fs.listStatus(meta):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def merge(batch: DataFrame, batch_id: int) -> None:
        fs, hpath = _fs(spark, table_path)
        bdir = "%s/batch=%d" % (table_path, batch_id)
        if not fs.exists(hpath("%s/_SUCCESS" % bdir)):
            fresh = batch.select(*QUAD_COLS).dropDuplicates(QUAD_COLS)
            try:
                current = (spark.read.parquet(table_path)
                           .filter(F.col("batch") != batch_id)
                           .select(*QUAD_COLS))
                cond = None
                for c in QUAD_COLS:
                    eq = fresh[c].eqNullSafe(current[c])
                    cond = eq if cond is None else cond & eq
                fresh = fresh.join(current, cond, "left_anti")
            except AnalysisException:  # first batch: no table yet
                pass
            fresh.write.mode("overwrite").parquet(bdir)
        staged = spark.read.parquet(bdir).select(*QUAD_COLS)

        vs = versions(fs, hpath)
        state, last_bid = None, -1
        if vs:
            stream = fs.open(hpath("%s/_meta/v%d.json" % (hash_root, vs[-1])))
            try:
                m = _json.loads(bytes(stream.readAllBytes()).decode())
            finally:
                stream.close()
            last_bid = m["batch_id"]
            state = spark.read.parquet("%s/%s" % (hash_root, m["data"]))
        if last_bid >= batch_id:
            return  # replay of a committed batch: full no-op
        delta = graph_content_hashes(staged)
        if state is not None:
            old = state.select(
                "graph", F.col("n_triples").alias("_n0"),
                F.col("content_hash").alias("_h0"))
            new = delta.select(
                "graph", F.col("n_triples").alias("_n1"),
                F.col("content_hash").alias("_h1"))
            delta = (old.join(new, "graph", "full")
                     .select("graph",
                             (F.coalesce("_n0", F.lit(0))
                              + F.coalesce("_n1", F.lit(0)))
                             .alias("n_triples"),
                             F.expr("coalesce(_h0, 0L) ^ coalesce(_h1, 0L)")
                             .alias("content_hash")))
        ver = (vs[-1] if vs else 0) + 1
        data_rel = "data/v%d" % ver
        delta.write.mode("overwrite").parquet(
            "%s/%s" % (hash_root, data_rel))
        meta_dir = "%s/_meta" % hash_root
        fs.mkdirs(hpath(meta_dir))
        tmp = hpath("%s/.v%d.json.tmp" % (meta_dir, ver))
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(_json.dumps(
                {"version": ver, "batch_id": batch_id,
                 "data": data_rel}).encode()))
        finally:
            out.close()
        if not fs.rename(tmp, hpath("%s/v%d.json" % (meta_dir, ver))):
            fs.delete(tmp, False)
            raise RuntimeError(
                "hash manifest commit race at %s v%d" % (hash_root, ver))

    return (quads.writeStream.foreachBatch(merge)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def read_graph_hashes(spark: SparkSession, hash_root: str) -> DataFrame:
    """The latest COMMITTED per-graph hash state (manifest-resolved;
    uncommitted version directories are invisible)."""
    import json as _json

    from ..kg.snapshots import _fs

    fs, hpath = _fs(spark, hash_root)
    meta = hpath("%s/_meta" % hash_root)
    vs = []
    if fs.exists(meta):
        for st in fs.listStatus(meta):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                vs.append(int(name[1:-5]))
    if not vs:
        return spark.createDataFrame(
            [], "graph string, n_triples long, content_hash long")
    stream = fs.open(hpath("%s/_meta/v%d.json" % (hash_root, max(vs))))
    try:
        m = _json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()
    return spark.read.parquet("%s/%s" % (hash_root, m["data"]))
