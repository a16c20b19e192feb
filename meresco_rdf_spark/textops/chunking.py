"""Fixed-window document chunking with overlap.

The context-length prep step of a training/embedding pipeline: split
each document into windows of at most ``max_tokens`` whitespace tokens,
sliding by ``max_tokens - overlap``.  Engine extension — part of the
prompt-mandated training-data set (``textops/sampling.py`` siblings:
``pack_sequences`` packs short docs UP to a budget, ``chunk_documents``
cuts long docs DOWN to one).

Scale shape: the whole operator is JVM array algebra on the text
column — ``split`` + ``sequence`` (chunk starts) + ``transform`` /
``slice`` / ``array_join`` — followed by ONE ``posexplode``.  No
shuffle at all: chunking is embarrassingly row-local, output rows ride
the input partitioning (a repartition belongs to the writer, not the
operator).  Chunk ids are deterministic (start-offset division), so
re-runs and resumes produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(docs: DataFrame, max_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """``(doc, chunk_id, n_tokens, chunk)`` — whitespace-token windows.

    Windows start every ``max_tokens - overlap`` tokens; the final
    window may be shorter (never empty).  ``chunk_id`` is the window
    ordinal (0-based).  Token-less documents yield no rows.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != "")
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.size(F.slice("_toks", s + 1, max_tokens)).alias("n_tokens"),
            F.array_join(F.slice("_toks", s + 1, max_tokens), " ")
            .alias("chunk")))
    return (docs.select(F.col(id_col).alias("doc"),
                        toks.alias("_toks"))
            .filter(F.size("_toks") > 0)
            .select("doc", F.posexplode(chunks).alias("chunk_id", "c"))
            .select("doc", "chunk_id",
                    F.col("c.n_tokens").alias("n_tokens"),
                    F.col("c.chunk").alias("chunk")))
