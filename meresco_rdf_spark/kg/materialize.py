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
    per-array, executed inside the agg output projection).

    HUB BOUND: ``collect_list`` materializes one array row per subject,
    so a degree-d hub builds a d-element array in a single task's agg
    buffer — unbounded row size.  This is the right table only when a
    max-degree invariant holds upstream; for unbounded-degree corpora
    write :func:`adjacency_chunked` (full fidelity, bounded rows) or
    :func:`adjacency_topk` (bounded truncation) instead."""
    edge = F.struct(
        F.col("pred"), F.col("obj_value"), F.col("obj_kind"), F.col("obj_lang"))
    return (
        triples.groupBy("subj")
        .agg(F.sort_array(F.collect_list(edge)).alias("edges"))
        .withColumn("degree", F.size(F.col("edges")))
    )


def adjacency_chunked(triples: DataFrame,
                      chunk_size: int = 1024) -> DataFrame:
    """Full-fidelity adjacency with BOUNDED rows: every subject's edges
    in sorted (pred, obj) order, split into ``chunk_size``-element array
    chunks ``(subj, chunk_id, edges, n_edges, degree)``.  Reconstructing
    the resource description = read the subject's chunks in chunk_id
    order (they land in the same subj_bucket partition, adjacent under
    the write sort).

    Why this survives hubs when :func:`adjacency` cannot: the chunk
    index comes from ``row_number`` over a subj-keyed window — a
    STREAMING window function backed by a spillable external sort, so a
    million-edge hub costs disk, never a million-element agg buffer —
    and the per-(subj, chunk_id) ``collect_list`` is bounded by
    ``chunk_size``.  One exchange total: the chunk aggregation and the
    degree window both reuse the row_number window's subj partitioning
    (subj ⊆ every later key set)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    from pyspark.sql import Window

    edge = F.struct(
        F.col("pred"), F.col("obj_value"), F.col("obj_kind"), F.col("obj_lang"))
    w = Window.partitionBy("subj").orderBy(
        "pred", "obj_value", "obj_kind", "obj_lang")
    chunked = (
        triples
        .withColumn("_idx", (F.row_number().over(w) - 1).cast("long"))
        .withColumn("chunk_id",
                    F.expr("_idx div %d" % chunk_size).cast("int"))
        .groupBy("subj", "chunk_id")
        .agg(F.sort_array(F.collect_list(edge)).alias("edges"),
             F.count("*").alias("n_edges"))
    )
    w_deg = Window.partitionBy("subj")
    return chunked.withColumn("degree", F.sum("n_edges").over(w_deg))


def adjacency_topk(triples: DataFrame, k: int = 128,
                   salt_buckets: int = 16) -> DataFrame:
    """Hot-subject-safe adjacency: top-``k`` edges per subject (sorted
    (pred, obj) order) via an explicit TWO-STAGE SALTED AGGREGATION — the
    north-star skew lever for hub entities.

    ``collect_list`` has no useful partial reduction: a hub subject with
    10^8 edges funnels every edge into one reducer and one giant row.
    Stage 1 keys (subj, salt) — the hub's edges reduce in parallel into
    ``salt_buckets`` arrays each truncated to k; stage 2 merges those
    bounded arrays and truncates again.  Shuffle volume and output row
    size are O(k x salt_buckets) per subject regardless of true degree;
    ``degree`` still reports the exact edge count."""
    edge = F.struct(
        F.col("pred"), F.col("obj_value"), F.col("obj_kind"), F.col("obj_lang"))
    salted = triples.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("pred"), F.col("obj_value")),
               F.lit(salt_buckets)))
    partial = salted.groupBy("subj", "_salt").agg(
        F.slice(F.sort_array(F.collect_list(edge)), 1, k).alias("edges"),
        F.count("*").alias("n"))
    return partial.groupBy("subj").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("edges"))), 1, k)
        .alias("edges"),
        F.sum("n").alias("degree"))


def write_adjacency_table(triples: DataFrame, path: str, buckets: int = 64,
                          mode: str = "overwrite",
                          chunk_size: int | None = None) -> None:
    """``chunk_size=None`` writes the one-row-per-subject table (requires
    a bounded-degree corpus — see :func:`adjacency`); setting it writes
    the hub-safe chunked layout, sorted (subj, chunk_id) within buckets."""
    if chunk_size is None:
        adj, sort_cols = adjacency(triples), ["subj"]
    else:
        adj, sort_cols = adjacency_chunked(triples, chunk_size), [
            "subj", "chunk_id"]
    (
        with_subj_bucket(adj, buckets)
        .repartition(buckets, "subj_bucket")
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy("subj_bucket")
        .parquet(path)
    )


TRIPLE_COLS = ["subj", "pred", "obj_value", "obj_kind", "obj_lang"]


def fused_bucket_dedup(merged: DataFrame, n_parts: int) -> DataFrame:
    """Set-semantics dedup FUSED into the bucketed-write layout, one
    exchange total: the write already hash-partitions on ``subj_bucket``
    and sorts by the triple columns, and subj_bucket is a function of
    subj — so after that (mandatory) exchange + sort, duplicate rows are
    adjacent within a partition, and a lag over the SAME partitioning/
    ordering dedups with no exchange of its own (Catalyst elides both
    the window's exchange and the pre-write sort).  A ``dropDuplicates``
    would instead add a second full-width shuffle of every surviving row
    (measured 1.82x wall, BENCH/BASELINE.md).  The lag key is the raw
    5-column STRUCT compared with ``eqNullSafe`` — injective by
    construction (no string-encoding of NULLs that a hostile obj_value
    could collide with).

    Shared by ``merge_triple_table`` and the plan audit
    (``tools/explain_audit.py``) so the asserted plan IS the shipped one."""
    from pyspark.sql import Window

    key = F.struct(*[F.col(c) for c in TRIPLE_COLS])
    w = Window.partitionBy("subj_bucket").orderBy(*TRIPLE_SORT)
    return (
        merged.repartition(n_parts, "subj_bucket")
        .withColumn("_prev", F.lag(key).over(w))
        .filter(~key.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )


def _roll_forward_pending_swap(fs, hadoop_path, path: str,
                               staging: str) -> None:
    """Complete the bucket swaps of a merge that crashed mid-commit:
    every ``subj_bucket=*`` dir still in staging is the full post-merge
    content of its bucket, so swap it in; then clear staging."""
    stg = hadoop_path(staging)
    if not fs.exists(stg):
        return
    for status in fs.listStatus(stg):
        name = status.getPath().getName()
        if name.startswith("subj_bucket="):
            dst = hadoop_path(path + "/" + name)
            fs.delete(dst, True)
            fs.rename(status.getPath(), dst)
    fs.delete(stg, True)


def merge_triple_table(spark, path: str, adds: DataFrame | None = None,
                       deletes: DataFrame | None = None,
                       buckets: int = 64) -> dict:
    """Iceberg-``MERGE``-style read-modify-write against the bucketed
    parquet triple table — the executable form of the O1/O3 scale story
    (``Graph.addTriple`` append-with-set-semantics / ``removeTriple``
    delete, reference graph.py:45-68).

    Exactly what an Iceberg ``MERGE``/``DELETE`` plans over a
    ``bucket(N, subj)`` table, emulated on plain parquet:

    - the touched bucket set comes from the delta's own subj hashes (a
      tiny driver-side list — O(buckets), never O(rows));
    - ONLY touched buckets are read (partition pruning on the
      ``subj_bucket`` directory column) and ONLY they are rewritten —
      untouched buckets' files are never opened;
    - deletes are null-safe full-row anti-joins, adds deduplicate against
      surviving rows (set semantics), both per-bucket-local because every
      side is hashed by the same bucket function — the join never
      shuffles across buckets;
    - the rewrite is a STAGE-AND-SWAP: the merged touched buckets are
      written to a dot-prefixed staging dir inside the table (invisible
      to parquet readers), then each touched bucket directory is swapped
      (delete + rename) — so a bucket whose rows were ALL deleted is
      genuinely removed (a dynamic partition overwrite would silently
      keep its old files: partitions absent from the output are never
      rewritten).  A crash mid-swap is ROLLED FORWARD by the next merge
      (staged dirs are complete post-merge bucket content — see
      ``_roll_forward_pending_swap``), so writer crash-recovery is
      covered; what this in-place emulation does NOT give is snapshot
      isolation for concurrent readers during the swap — for that, use
      the copy-on-write table in ``kg/snapshots.py`` (immutable data
      dirs + atomic manifest CAS = isolation, time travel, optimistic
      concurrency), at the cost of retaining superseded files until
      ``expire_snapshots``.

    Returns {"buckets_touched": [...], "rows_after": per-touched-bucket
    count}.  Idempotent: re-running the same merge is a no-op."""
    sets = []
    if adds is not None:
        sets.append(with_subj_bucket(adds.select(*TRIPLE_COLS), buckets))
    if deletes is not None:
        sets.append(with_subj_bucket(deletes.select(*TRIPLE_COLS), buckets))
    if not sets:
        return {"buckets_touched": [], "rows_after": 0}
    delta_union = sets[0] if len(sets) == 1 else sets[0].unionByName(sets[1])
    touched = sorted(
        r.subj_bucket
        for r in delta_union.select("subj_bucket").distinct().collect())
    if not touched:
        return {"buckets_touched": [], "rows_after": 0}

    existing = spark.read.parquet(path).filter(
        F.col("subj_bucket").isin(touched))
    survivors = existing
    if deletes is not None:
        dels = with_subj_bucket(deletes.select(*TRIPLE_COLS), buckets)
        cond = F.lit(True)
        for c in TRIPLE_COLS + ["subj_bucket"]:
            cond = cond & survivors[c].eqNullSafe(dels[c])
        survivors = survivors.join(dels, cond, "left_anti")
    merged = survivors
    if adds is not None:
        merged = survivors.unionByName(
            with_subj_bucket(adds.select(*TRIPLE_COLS), buckets)
            .filter(F.col("subj_bucket").isin(touched)))

    deduped = fused_bucket_dedup(merged, len(touched))

    # Stage-and-swap: write the merged touched buckets under a
    # dot-prefixed dir inside the table (parquet readers skip '.'/'_'
    # entries, so a crashed merge never corrupts reads), then swap each
    # touched bucket directory.  The swap DELETES buckets with no
    # surviving rows — the case a dynamic partition overwrite silently
    # gets wrong (it only rewrites partitions present in the output).
    # No explicit pre-write sort: the dedup window's ordering survives
    # the filter, satisfies the writer's clustering-by-partition-column
    # requirement, and leaves rows TRIPLE_SORT-ordered within each
    # bucket file — write_triple_table's row-group-stats layout.
    staging = path + "/.merge-staging"
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    fs = hadoop_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    # ROLL FORWARD a crashed predecessor before reading `existing`: a
    # staged bucket dir is the COMPLETE post-merge content of that bucket
    # (rename removes it from staging on success), so leftovers are
    # exactly the swaps that didn't complete — finishing them restores
    # any bucket the crash caught between delete and rename.  Discarding
    # leftovers instead would lose that bucket's rows for good.
    _roll_forward_pending_swap(fs, hadoop_path, path, staging)
    deduped.write.mode("overwrite").partitionBy("subj_bucket").parquet(staging)
    for b in touched:
        dst = hadoop_path("%s/subj_bucket=%d" % (path, b))
        src = hadoop_path("%s/subj_bucket=%d" % (staging, b))
        fs.delete(dst, True)
        if fs.exists(src):
            fs.rename(src, dst)
    fs.delete(hadoop_path(staging), True)

    # an emptied table has no part files left; reading it would fail on
    # schema inference, so count only when a bucket dir survives
    has_buckets = any(
        s.getPath().getName().startswith("subj_bucket=")
        for s in fs.listStatus(hadoop_path(path)))
    rows_after = (
        spark.read.parquet(path)
        .filter(F.col("subj_bucket").isin(touched)).count()
        if has_buckets else 0)
    return {"buckets_touched": touched, "rows_after": rows_after}


def edge_cut_stats(triples: DataFrame,
                   bucket_col: str = "subj_bucket") -> DataFrame:
    """Locality diagnostic for a bucketed triple table: of the
    uri-object edges whose object also appears as a subject (the edges
    a traversal or self-join actually follows), how many cross a
    bucket boundary — i.e. the shuffle a subject-co-located plan pays
    per hop.  Returns one row
    ``(n_edges, cut_edges, cut_ppm)`` with the ratio in exact
    parts-per-million (BIGINT, no float).

    Operational use: compare layouts (hash vs domain-aware bucketing)
    and justify ``assume_conv_partitioned``-style elisions with a
    number instead of a hope.  Plan: one dedup of the (subj, bucket)
    projection (bucket is functional on subj), one obj-keyed join of
    the uri-edge slice, one global aggregate — no corpus-sized
    broadcast.
    """
    subj_b = (triples.select("subj", bucket_col)
              .dropDuplicates(["subj"])
              .select(F.col("subj").alias("o_subj"),
                      F.col(bucket_col).alias("o_bucket")))
    edges = (triples.filter(F.col("obj_kind") == "uri")
             .select(F.col(bucket_col).alias("s_bucket"), "obj_value"))
    joined = edges.join(subj_b, edges["obj_value"] == subj_b["o_subj"])
    # Empty-corpus guard: sum() over zero rows is NULL and the ppm ratio
    # would divide by zero — a diagnostic must return defined zeros, not
    # a row of NULLs.
    return joined.agg(
        F.count("*").alias("n_edges"),
        F.coalesce(
            F.sum((F.col("s_bucket") != F.col("o_bucket")).cast("long")),
            F.lit(0).cast("long"))
        .alias("cut_edges")).select(
        "n_edges", "cut_edges",
        F.when(F.col("n_edges") > 0,
               F.expr("cut_edges * 1000000 div n_edges"))
        .otherwise(F.lit(0).cast("long")).alias("cut_ppm"))
