"""Windowed token co-occurrence counts (collocation mining).

The distributional-statistics primitive under PMI collocation lists,
phrase detection, and word-association features.  Engine extension —
part of the prompt-mandated text-analysis set.

Determinism contract: the operator returns EXACT integer counts —
``(x, y, pair_count)`` plus marginal token counts and the corpus total
— and deliberately does NOT compute PMI itself: PMI needs a log (not
bit-identical across engines) or a fixed-point rational whose
numerator overflows BIGINT at corpus scale.  Every PMI-family score is
a pure presentation-layer function of these four integers; consumers
rank with whatever variant they want without ever re-scanning the
corpus.  (The same division of labor as ``textops/tfidf.py``, which
CAN stay fixed-point because its numerator is bounded by doc length.)

Scale shape: pair generation is ROW-LOCAL array algebra — for each
document, ``transform`` over token positions emits the (token,
following-token-within-window) pairs, flattened and exploded once; no
self-join, no positional shuffle.  Counting is two partial/map-side
combined aggregations (pairs, and unigram marginals) — hot tokens
combine before the exchange, so skew costs map-side CPU, not a hot
reducer.  ``min_count`` prunes the hapax tail before the marginals
join; the marginal relation is vocabulary-sized and joins keyed on the
token (AQE broadcasts it when small).

Pairs are DIRECTIONAL (x precedes y within ``window`` tokens); callers
wanting symmetric counts sum both orientations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import tokens


def collocation_counts(docs: DataFrame, window: int = 2,
                       min_count: int = 1, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """``(x, y, pair_count, x_count, y_count, n_tokens)`` for every
    ordered token pair co-occurring within ``window`` positions.

    ``x_count`` / ``y_count`` are corpus unigram counts, ``n_tokens``
    the corpus token total — everything a PMI / log-likelihood /
    Jaccard association score needs, all exact BIGINTs.  ``min_count``
    drops pairs rarer than the floor BEFORE the marginals join.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = docs.select(tokens(F.col(text_col)).alias("t"))
    pairs_col = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: F.transform(
            F.slice("t", i + 1, window),
            lambda y: F.struct(F.element_at("t", i).alias("x"),
                               y.alias("y")))))
    pair_counts = (toks.filter(F.size("t") > 1)
                   .select(F.explode(pairs_col).alias("p"))
                   .groupBy(F.col("p.x").alias("x"),
                            F.col("p.y").alias("y"))
                   .agg(F.count("*").alias("pair_count")))
    if min_count > 1:
        pair_counts = pair_counts.filter(
            F.col("pair_count") >= min_count)
    # vocabulary-sized; materialized because it feeds the total (an
    # action) plus both marginal joins — without it the corpus would
    # re-scan three times.  localCheckpoint rather than persist: the
    # blocks are released by the ContextCleaner when the returned plan
    # is dropped, so repeated calls in one session don't accumulate
    # leaked cache entries (persist would need an explicit unpersist
    # AFTER the caller finishes executing the result, which we can't
    # schedule from here).  Trade (round-4 advisor): checkpoint blocks
    # are unreplicated and lineage-free, so on a multi-executor cluster
    # losing an executor between the total collect and the marginal
    # joins FAILS the job instead of recomputing — acceptable in
    # local mode; cluster callers that need fault tolerance should
    # reliable-checkpoint (spark.sparkContext.setCheckpointDir +
    # .checkpoint()) or persist the vocabulary themselves and unpersist
    # after consuming the result.
    uni = (toks.select(F.explode("t").alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("cnt"))
           .localCheckpoint(eager=True))
    total = uni.agg(F.sum("cnt")).collect()[0][0] or 0
    return (pair_counts
            .join(uni.select(F.col("tok").alias("x"),
                             F.col("cnt").alias("x_count")), "x")
            .join(uni.select(F.col("tok").alias("y"),
                             F.col("cnt").alias("y_count")), "y")
            .select("x", "y", "pair_count", "x_count", "y_count",
                    F.lit(int(total)).cast("long").alias("n_tokens")))
