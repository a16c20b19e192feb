"""TF-IDF term scoring over the documents relation.

The keyword-extraction / relevance-weighting primitive a training-data
pipeline uses for topic balancing, near-duplicate triage, and
retrieval-style filtering.  Engine extension — part of the
prompt-mandated text-analysis set (``textops/textstats.py`` siblings).

Determinism: the idf factor is the RATIONAL ``N/df`` in fixed-point
BIGINT (``score = tf * N * SCALE // df``), not ``log(N/df)`` — float
logs are not bit-identical across engines, which would break the
repo-wide value-hash oracle discipline (the same reasoning as
``graph_algos.SCALE`` PageRank).  Per document the ranking is
UNCHANGED for fixed tf (N/df and log(N/df) are both monotone
decreasing in df); across tf values the rational variant weighs rarity
more steeply than the textbook log — these are order statistics for
filtering, and a presentation layer is free to take the log of
``n_docs/df`` at render time.

Scale shape: one explode of the whitespace token split, ONE
aggregation to ``(doc, term, tf)`` (partial/map-side combined — the
natural key is fine-grained, no skew), one aggregation of that to
``(term, df)`` (distinct docs = plain count, since the tf relation is
already one row per (doc, term)), a broadcast-friendly join of df back
onto the tf relation keyed term, and a per-doc top-k window (keyed
doc — fine-grained, no hot key possible).  The corpus text is read
once; nothing corpus-sized is broadcast (df rides a shuffle join keyed
term when the vocabulary is large; AQE may demote it to broadcast when
it is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import tokens

SCALE = 1_000_000  # fixed-point unit for the rational idf


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """``(doc, term, tf)`` — whitespace tokens, lowercased."""
    return (docs.select(F.col(id_col).alias("doc"),
                        F.explode(tokens(F.col(text_col))).alias("term"))
            .groupBy("doc", "term").agg(F.count("*").alias("tf")))


def tfidf_topk(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
               text_col: str = "text",
               min_df: int = 1) -> DataFrame:
    """Top-``k`` terms per document by fixed-point TF-IDF.

    Returns ``(doc, rnk, term, tf, df, score)`` with
    ``score = tf * n_docs * SCALE // df`` (BIGINT, exact) and ``rnk``
    dense 1..k per doc.  Ties break on term (lexicographic) so the
    result is fully deterministic.  ``min_df`` drops hapax-style noise
    terms before ranking when > 1.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    n_docs = docs.select(F.col(id_col)).distinct().count()
    tf = term_frequencies(docs, id_col, text_col)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        df = df.filter(F.col("df") >= min_df)
    # BIGINT `div`, not float `/` + cast: tf*N*SCALE can exceed 2^53,
    # where double rounding would diverge from exact integer division
    scored = (tf.join(df, "term")
              .withColumn("score", F.expr(
                  "(tf * CAST(%d AS BIGINT) * CAST(%d AS BIGINT)) div df"
                  % (int(n_docs), SCALE))))
    w = Window.partitionBy("doc").orderBy(
        F.col("score").desc(), F.col("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("doc", "rnk", "term", "tf", "df", "score"))
