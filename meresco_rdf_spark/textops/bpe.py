"""Byte-pair-encoding vocabulary training and application, Spark-first.

The real BPE merge loop (Sennrich et al. 2016) — not the regex
approximation in ``textstats.bpe_ish_tokens``: start from character
symbols, repeatedly count adjacent symbol pairs across the corpus,
merge the most frequent pair, K times.  The trained merge list IS the
tokenizer: ``apply_bpe`` replays it over any corpus.

Spark-first mechanics — the per-word sequential merge (greedy
left-to-right, where a merged symbol must immediately participate in
further matches to its left) looks like a per-row loop, but it IS a
fold, and ``F.aggregate`` expresses folds as pure JVM column
expressions: the accumulator is the merged-so-far array; each step
either fuses the incoming symbol into the accumulator's tail (when
tail == left and incoming == right) or appends it.  No Python UDF
anywhere — training and application stay inside whole-stage codegen.

Scale shape, per merge round: ONE partial-aggregated shuffle of
``(pair, count)`` rows out of the exploded adjacent-pair projection,
and one driver-side argmax over the vocabulary-sized count relation
(control-plane, like ``kmeans``' centroid collect).  The symbol
relation is re-derived by folding the merge into the cached previous
round and ``localCheckpoint``-ed every ``checkpoint_every`` rounds so
plan depth stays bounded in K.  Train on a sample (``train_on=``) and
apply corpus-wide — the 100-TB recipe, same hook as
``textops/kmeans.py``.

Determinism: ties in pair frequency break on the lexicographically
smallest (left, right) pair, so the merge list is bit-identical across
partitionings and engines.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .textstats import tokens


def _word_symbols(docs: DataFrame, text_col: str) -> DataFrame:
    """One row per word occurrence: ``syms`` = array of single-char
    symbols with an end-of-word marker on the last (the classic BPE
    word-boundary convention, so merges never cross words)."""
    words = (docs.select(F.explode(tokens(F.col(text_col)))
                         .alias("word")))
    return words.select(_char_symbols(F.col("word")).alias("syms"))


def _char_symbols(word):
    """Word -> array of single-char symbols, ``</w>`` fused onto the
    last (``split`` on the empty pattern emits a trailing empty string
    — filtered before marking)."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.transform(
        chars,
        lambda c, i: F.when(i == F.size(chars) - 1,
                            F.concat(c, F.lit("</w>"))).otherwise(c))


def _merge_expr(col, left: str, right: str):
    """Fold ``col`` (array of symbols), fusing every adjacent
    (left, right) occurrence greedily left-to-right — pure column
    expression via ``F.aggregate``."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(left + right)))
        ).otherwise(F.concat(acc, F.array(t))))


def train_bpe(docs: DataFrame, n_merges: int,
              text_col: str = "text", min_count: int = 2,
              checkpoint_every: int = 8,
              train_on: Optional[DataFrame] = None
              ) -> List[Tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, count), ...]`` (may stop early when no pair
    reaches ``min_count``).  ``train_on`` substitutes a sample corpus
    for training (apply the result corpus-wide with ``apply_bpe``)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    source = train_on if train_on is not None else docs
    syms = _word_symbols(source, text_col).localCheckpoint(eager=True)
    merges: List[Tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (syms.select(F.explode(F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1).alias("l"),
            F.slice(F.col("syms"), 2, F.greatest(
                F.size("syms") - 1, F.lit(0))).alias("r"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.count("*").alias("n")))
        top = (pairs.orderBy(F.col("n").desc(), "l", "r").limit(1)
               .collect())
        if not top or top[0]["n"] < min_count:
            break
        left, right, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((rank, left, right, int(n)))
        syms = syms.select(_merge_expr(F.col("syms"), left, right)
                           .alias("syms"))
        if (rank + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=True)
    return merges


def apply_bpe(docs: DataFrame, merges: List[Tuple[int, str, str, int]],
              text_col: str = "text", out_col: str = "bpe_tokens",
              id_cols: Optional[List[str]] = None) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: per word, the
    character symbols folded through every merge in rank order; output
    is one array of sub-word symbols per document (end-of-word marker
    kept — strip at render time).  Adds ``out_col``; K chained folds
    stay JVM-side (plan depth grows with K — the expression tree is
    built once per QUERY, not per row)."""
    if id_cols is None:
        id_cols = ["doc_id"]
    expr = _char_symbols(F.col("word"))
    for _, left, right, _n in sorted(merges):
        expr = _merge_expr(expr, left, right)
    per_word = (docs.select(
        *[F.col(c) for c in id_cols],
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"))
        .select(*id_cols, "pos", expr.alias("ws")))
    # order restored explicitly: collect_list order across a shuffle is
    # not a contract — sort the (pos, ws) structs, then flatten
    return (per_word.groupBy(*id_cols)
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ws"))),
                lambda x: x["ws"])).alias(out_col)))
