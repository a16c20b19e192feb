"""Analytics operators Spark lacks natively, composed from built-ins
(guide: 'compose built-in DataFrame ops first').

- **as-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key.  Implemented as the union-window
  pattern: tag both sides, one window per key ordered by (ts, side),
  ``last(value, ignorenulls)`` carries the most recent right value onto
  each left row.  ONE shuffle on the key (no range explosion, no pandas);
  skew on hot keys is AQE's problem, same as any keyed window.
- **range join** — left rows falling inside right-side [start, end)
  intervals.  Two strategies: ``broadcast`` (nested-loop against a small
  broadcast interval table — right when intervals fit in memory) and
  ``bucketized`` (both sides mapped to fixed-width buckets, equi-join on
  bucket, exact filter — the scale path: shuffle is keyed (bucket), cost
  O(rows x intervals-per-bucket) instead of O(rows x intervals)).
- **pivot / cube / quantiles** — thin, typed wrappers that keep the
  engine's alias discipline so oracles can reproduce values exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def as_of_join(left: DataFrame, right: DataFrame, key: str, ts: str,
               value_cols: Sequence[str],
               suffix: str = "_asof") -> DataFrame:
    """For every left row: the most recent right row at-or-before its
    timestamp, per key.  Ties on ts resolve to the right row (<= wins),
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.

    ``left`` and ``right`` must share ``key`` and ``ts`` columns; right's
    ``value_cols`` are carried over as ``<col><suffix>``.  For a
    deterministic result the right side must be unique per (key, ts) —
    dedupe first (ties among simultaneous right rows are otherwise
    window-order-dependent)."""
    carried = ["%s%s" % (c, suffix) for c in value_cols]
    rtypes = dict(right.dtypes)
    # Right payloads travel as ONE struct that is non-null exactly for
    # right rows: last(_payload, ignorenulls) then carries "the latest
    # right ROW at-or-before", even when that row's value columns are
    # NULL — matching DuckDB ASOF semantics (latest matching row wins;
    # per-column ignorenulls would instead resurrect an older non-NULL).
    l_tag = left.select(
        key, ts, *[F.col(c) for c in left.columns if c not in (key, ts)],
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<%s>" % ", ".join(
                "%s: %s" % (c, rtypes[c]) for c in value_cols)
        ).alias("_payload"))
    r_tag = right.select(
        key, ts,
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in (key, ts)],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"))
    unioned = l_tag.unionByName(r_tag)
    w = (Window.partitionBy(key).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.withColumn(
        "_f", F.last("_payload", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_side") == 1)
        .select(*[F.col(c) for c in left.columns],
                *[F.col("_f")[c].alias(cc)
                  for c, cc in zip(value_cols, carried)])
    )


def range_join_broadcast(rows: DataFrame, intervals: DataFrame,
                         ts: str, start: str, end: str) -> DataFrame:
    """rows x intervals with start <= ts < end; interval side broadcast
    (small-interval-table case)."""
    cond = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    return rows.join(F.broadcast(intervals), cond)


def range_join_bucketized(rows: DataFrame, intervals: DataFrame,
                          ts: str, start: str, end: str,
                          bucket_width: int) -> DataFrame:
    """Scale path: explode each interval over the fixed-width buckets it
    overlaps, equi-join rows on their bucket, exact-filter.  Shuffle key =
    bucket id; per-bucket work is rows-in-bucket x intervals-touching-
    bucket.  ``ts``/``start``/``end`` must be numeric (e.g. epoch
    micros); ``bucket_width`` in the same unit."""
    row_b = rows.withColumn("_bucket", (F.col(ts) / bucket_width).cast("long"))
    iv_b = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence((F.col(start) / bucket_width).cast("long"),
                             ((F.col(end) - 1) / bucket_width).cast("long"))))
    cond = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    return row_b.join(iv_b, "_bucket").filter(cond).drop("_bucket")


def pivot_sum(df: DataFrame, row_key: str, pivot_col: str,
              pivot_values: Sequence[str], value: Column) -> DataFrame:
    """Typed pivot with pinned output columns (pinned values = stable
    schema; Catalyst turns this into one hash-agg pass)."""
    return (
        df.groupBy(row_key)
        .pivot(pivot_col, list(pivot_values))
        .agg(F.sum(value))
    )


def cube_counts(df: DataFrame, dims: Sequence[str]) -> DataFrame:
    """CUBE over dims with bigint counts (NULL = 'all' marker rows)."""
    return df.cube(*[F.col(d) for d in dims]).agg(F.count("*").alias("n"))


def group_quantiles(df: DataFrame, key: str, value: str,
                    probs: Sequence[float]) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``), exploded to one row per
    (group, prob)."""
    arr = F.percentile(F.col(value), F.array(*[F.lit(p) for p in probs]))
    probs_arr = F.array(*[F.lit(p) for p in probs])
    agged = df.groupBy(key).agg(arr.alias("qs"))
    return (
        agged.select(
            key,
            F.explode(F.arrays_zip(probs_arr.alias("prob"), F.col("qs").alias("q")))
            .alias("z"))
        .select(key, F.col("z.prob").alias("prob"),
                F.round(F.col("z.q"), 6).alias("quantile"))
    )
