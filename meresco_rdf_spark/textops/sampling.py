"""Deterministic corpus sampling, splitting, and sequence packing — the
dataset-assembly operators a large-scale LLM training pipeline runs after
filtering/dedup.  All pure ``pyspark.sql.functions`` column expressions
(whole-stage codegen, zero Python) built on md5 so a DuckDB oracle can
compute bit-identical assignments.

Why md5 and not ``rand()``/``xxhash64``: the split/sample/pack decisions
must be (a) reproducible across engines (oracle discipline), (b) stable
under re-runs and repartitioning (resume/idempotence discipline — a
document's split NEVER depends on which executor saw it), and (c)
independent of row order.  Keying every decision on ``md5(id)`` gives all
three; the price (a few ns/row of hashing) is noise next to the scan.

Scale shapes:

- ``assign_split`` / ``stratified_sample``: narrow per-row expressions;
  the only shuffle is ``stratified_sample``'s per-stratum window, which
  partitions by the stratum key (hundreds of strata -> fine; for
  pathological single-stratum corpora use ``assign_split`` with a
  weights-derived threshold instead, which needs no shuffle at all).
- ``pack_sequences``: ONE hash-partitioned window per bucket.  The bucket
  count is the parallelism knob: each bucket's documents are concatenated
  in md5 order and chunked, so packing is embarrassingly parallel across
  buckets and the per-bucket sort is the only cost.  At 100 TB raise
  ``bucket_hex_len`` (1 hex char = 16 buckets, 4 = 65536) so each bucket's
  token stream fits comfortably in one task's sort budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .textstats import token_count

#: total ordering space for a 4-hex-char md5 prefix
_SPLIT_SPACE = 16 ** 4


def _md5_of(id_col: Column) -> Column:
    return F.md5(id_col.cast("string"))


def split_thresholds(weights: list[tuple[str, int]]) -> list[tuple[str, str]]:
    """Turn ``[(name, percent), ...]`` into cumulative 4-hex-char md5-prefix
    upper bounds, e.g. ``[('train', 80), ('val', 10), ('test', 10)]`` ->
    ``[('train', 'cccc'), ('val', 'e666'), ('test', None)]`` (the last
    split takes the remainder; ``None`` = no upper bound).

    Comparing hex prefixes lexicographically is monotone in the hash value
    (hex digits are ASCII-ordered), so the same string literals drive both
    the Spark plan and the DuckDB oracle.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if sum(p for _, p in weights) != 100:
        raise ValueError("split percents must sum to 100")
    out: list[tuple[str, str]] = []
    cum = 0
    for name, pct in weights[:-1]:
        if pct <= 0:
            raise ValueError("split percents must be positive")
        cum += pct
        out.append((name, format(_SPLIT_SPACE * cum // 100, "04x")))
    out.append((weights[-1][0], None))
    return out


def assign_split(df: DataFrame, id_col: str,
                 weights: list[tuple[str, int]] | None = None) -> DataFrame:
    """Deterministic train/val/test assignment: bucket each row by the
    first 4 hex chars of ``md5(id)`` and cut the [0, 16^4) space at the
    cumulative weight boundaries.  Adds a ``split`` column.

    Per-row, shuffle-free, order-independent: the split a document lands
    in is a pure function of its id, so incremental ingestion never moves
    a document between splits (the property that keeps eval sets
    uncontaminated as the corpus grows).
    """
    weights = weights or [("train", 80), ("val", 10), ("test", 10)]
    prefix = F.substring(_md5_of(F.col(id_col)), 1, 4)
    expr = None
    for name, bound in split_thresholds(weights):
        if bound is None:
            expr = expr.otherwise(F.lit(name)) if expr is not None else F.lit(name)
        else:
            cond = prefix < F.lit(bound)
            expr = (F.when(cond, F.lit(name)) if expr is None
                    else expr.when(cond, F.lit(name)))
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      n_per_stratum: int,
                      salt_buckets: int | None = None) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` documents
    with the smallest ``md5(id)`` per stratum.  md5 order is uniform and
    id-stable, so this IS a uniform random sample per stratum — but one
    that every engine, every run, and every cluster size reproduces.

    Two physical paths, identical output (asserted in tests and by the
    driver oracle):

    - ``salt_buckets=None`` (default): ONE window partitioned by the
      stratum key.  Right when strata are balanced; a hot stratum
      concentrates its full sort in one task.
    - ``salt_buckets=S`` (the hot-stratum path): two-stage top-k
      aggregation — stage 1 keyed ``(stratum, salt)`` keeps only each
      salt group's ``n`` smallest (bounding any task's buffer to
      ~stratum/S rows), stage 2 keyed ``stratum`` merges ``S`` arrays of
      ≤ ``n`` candidates (≤ S·n rows per stratum, trivially bounded) —
      then the tiny winner set broadcast-joins back to the corpus, which
      is never shuffled.  No window anywhere on this path
      (tools/explain_audit.py pins it).
    """
    if salt_buckets is None:
        w = Window.partitionBy(strata_col).orderBy(_md5_of(F.col(id_col)))
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= n_per_stratum)
                .drop("_rn"))
    h = _md5_of(F.col(id_col))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    cand = (df.select(F.col(strata_col).alias("_strata"),
                      F.col(id_col).alias("_id"), h.alias("_h"),
                      salt.alias("_salt"))
            .groupBy("_strata", "_salt")
            .agg(F.slice(F.array_sort(F.collect_list(F.struct("_h", "_id"))),
                         1, n_per_stratum).alias("_cand"))
            .groupBy("_strata")
            .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_cand"))),
                         1, n_per_stratum).alias("_cand"))
            .select("_strata", F.explode("_cand").alias("_c"))
            .select("_strata", F.col("_c._id").alias("_id")))
    return df.join(
        F.broadcast(cand),
        (F.col(strata_col) == F.col("_strata"))
        & (F.col(id_col) == F.col("_id"))).drop("_strata", "_id")


def pack_sequences(df: DataFrame, id_col: str, max_len: int,
                   text_col: str = "text",
                   token_count_col: str | None = None,
                   bucket_hex_len: int = 1) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    ``(bucket, pack_id, pack_offset)`` such that concatenating the
    bucket's documents in md5 order and splitting the token stream every
    ``max_len`` tokens reproduces the assignment — the standard LLM
    pretraining packing layout, computed as metadata only (no text moves).

    Columns out: ``id_col, bucket, n_tokens, pack_id, pack_offset``.
    ``pack_id`` = which ``max_len``-token window the document STARTS in;
    ``pack_offset`` = its token offset inside that window.  Documents
    longer than ``max_len`` simply span packs (the trainer's chunker cuts
    them); packing never drops or reorders tokens.

    Plan shape: one window (running sum of token counts) hash-partitioned
    by ``bucket`` and ordered by the full md5 — 16^bucket_hex_len
    independent sorts, each over corpus/buckets documents.  The running
    sum is the only sequential dependency in packing, and scoping it to a
    bucket is what makes the op scale: buckets never talk to each other.
    """
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    h = _md5_of(F.col(id_col))
    toks = (F.col(token_count_col).cast("long") if token_count_col
            else token_count(F.col(text_col)).cast("long"))
    base = df.select(F.col(id_col), F.substring(h, 1, bucket_hex_len).alias("bucket"),
                     h.alias("_h"), toks.alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy("_h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    # BIGINT `div`, not float `/`: the running token total of a bucket can
    # legitimately exceed 2^53 at extreme scale, where double division
    # silently mis-floors.
    return (base.withColumn("_start", cum - F.col("n_tokens"))
            .withColumn("pack_id", F.expr("_start div %d" % max_len))
            .withColumn("pack_offset", F.col("_start") % max_len)
            .drop("_h", "_start"))


def weighted_sample(df: DataFrame, rate_ppm: Column | int,
                    id_col: str = "doc_id") -> DataFrame:
    """Per-row Bernoulli sampling with DETERMINISTIC coin flips: keep a
    row iff ``md5int(id) mod 1e6 < rate_ppm`` (parts-per-million, so
    the keep probability is an exact integer — no float boundary).

    ``rate_ppm`` may be a per-row Column — the data-mixing primitive: a
    mixture recipe assigns each domain/language/quality-tier its own
    rate and ONE shuffle-free pass materializes the mix.  The md5 key
    gives the repo-wide sampling guarantees (reproducible across
    engines, stable under re-runs and repartitioning, independent of
    row order) and composes with ``assign_split``: the split uses the
    hash PREFIX, this draw uses the hash value mod 1e6 — decorrelated
    digits of the same hash, so sampling never biases splits.

    Scale shape: a narrow per-row filter, zero shuffle, pushes down to
    the scan's data filters like any other predicate.
    """
    if isinstance(rate_ppm, int):
        if not 0 <= rate_ppm <= 1_000_000:
            raise ValueError("rate_ppm must be in [0, 1e6]")
        rate_ppm = F.lit(rate_ppm)
    draw = F.pmod(
        F.conv(F.substring(_md5_of(F.col(id_col)), 1, 15), 16, 10)
        .cast("long"),
        F.lit(1_000_000))
    return df.filter(draw < rate_ppm)
