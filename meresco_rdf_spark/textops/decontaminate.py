"""Benchmark decontamination: flag corpus documents sharing any n-gram
with an evaluation set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM §7
style): a document is contaminated if any length-``n`` token window of
its normalized text also occurs in the benchmark/eval corpus.

Spark-first plan:

- n-grams are built per row with pure column expressions
  (``transform`` over a ``sequence`` of window starts + ``slice`` +
  ``concat_ws``) — whole-stage codegen, no Python;
- the eval side is DISTINCT n-grams only — for real benchmark suites
  that is MBs, so the probe join is a **broadcast** hash join (zero
  shuffle of the corpus); pass ``broadcast_eval=False`` when the eval
  set is genuinely huge and a shuffled join is the right plan;
- on the scale path n-grams travel as ``xxhash64`` fingerprints
  (8 bytes), never as strings — the corpus side explodes to
  (doc_id, gram_hash) and aggregates straight back down to per-doc hit
  counts (partial+final hash agg, one narrow shuffle on doc_id).

A 64-bit fingerprint collision could flag one extra document per
~10^12 corpus-grams x eval-grams pairs — the accepted trade at 100 TB
(set ``hash_grams=False`` to join on the gram strings instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import normalized_text


def ngrams(col: Column, n: int) -> Column:
    """All length-``n`` token windows of the normalized text, as
    space-joined strings.  Empty array when the text is shorter than
    ``n`` tokens."""
    toks = F.filter(F.split(normalized_text(col), " "), lambda x: x != "")
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(corpus: DataFrame, eval_set: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  hash_grams: bool = True,
                  broadcast_eval: bool = True) -> DataFrame:
    """Per-corpus-document contamination decision against ``eval_set``.

    Returns ``(id_col, n_hits, contaminated)`` for EVERY corpus row:
    ``n_hits`` = number of distinct n-grams of the document that occur
    anywhere in the eval set, ``contaminated`` = ``n_hits > 0``.
    """
    gram = F.explode(F.array_distinct(ngrams(F.col(text_col), n)))
    if hash_grams:
        key = F.xxhash64(F.col("gram")).alias("g")
    else:
        key = F.col("gram").alias("g")

    eval_grams = (eval_set
                  .select(gram.alias("gram"))
                  .select(key)
                  .distinct())
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)

    doc_grams = corpus.select(F.col(id_col), gram.alias("gram")).select(
        F.col(id_col), key)
    hits = (doc_grams.join(eval_grams, "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (corpus.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
                    (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
                    .alias("contaminated")))
