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
    for training (apply the result corpus-wide with ``apply_bpe``).

    Cost model — price this before pointing it at a corpus: every merge
    is ONE driver-synchronized Spark job (a partial-aggregated
    (pair, count) shuffle over the full symbol relation + a
    vocabulary-sized argmax collect), so wall-clock is
    ``n_merges × (one corpus aggregation)`` and does NOT amortize
    across merges.  At production vocab sizes (10k–50k merges) that is
    tens of thousands of corpus scans — never train on the raw corpus.
    The 100-TB recipe: pass a bounded sample via ``train_on=`` (≤1M
    docs keeps each round sub-second-to-seconds and the merge list is
    statistically indistinguishable), then ``apply_bpe`` corpus-wide —
    the apply path is one pass, auto-switching to the Arrow tokenizer
    above ARROW_MERGE_THRESHOLD merges.  Measured (tools/bench_bpe.py,
    local[32]): merges/sec at two corpus sizes documented in
    BENCH/BASELINE.md."""
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


# Above this many merges the chained-fold plan switches to the Arrow
# tokenizer: Catalyst analysis/codegen cost grows linearly with the
# fold chain's expression depth, which is fine at small K but would
# blow compile time (long before data size matters) at production
# vocabularies of 10k-50k merges.
ARROW_MERGE_THRESHOLD = 64


def apply_bpe(docs: DataFrame, merges: List[Tuple[int, str, str, int]],
              text_col: str = "text", out_col: str = "bpe_tokens",
              id_cols: Optional[List[str]] = None,
              strategy: str = "auto") -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: per word, the
    character symbols folded through every merge in rank order; output
    is one array of sub-word symbols per document (end-of-word marker
    kept — strip at render time).  Keeps ``id_cols`` + ``out_col``;
    documents with zero tokens are dropped (both strategies).

    Two physically different, semantically identical strategies:

    - ``"fold"``: K chained ``F.aggregate`` folds, pure JVM column
      expressions inside whole-stage codegen.  Plan-expression depth
      grows linearly with K (built once per QUERY, not per row) — the
      right plan at small K, a Catalyst compile-time wall at
      production vocab sizes.
    - ``"arrow"``: one ``mapInPandas`` pass; per Arrow batch, each
      UNIQUE word is tokenized once (Zipf makes the word cache the
      dominant win) by iteratively fusing the lowest-rank adjacent
      pair, greedy left-to-right per pass.  Zero shuffle — the fold
      path's posexplode/groupBy re-assembly disappears because the
      whole document is tokenized row-locally.  O(1) plan depth in K.

    Equivalence of the two orders (rank-order full replay vs.
    lowest-rank-present iteration): fusing a pair never creates a new
    adjacency between two previously existing symbols — only pairs
    involving the freshly fused symbol, and any merge consuming that
    symbol has a strictly higher rank in a TRAINED list (the fused
    symbol did not exist earlier in training).  So once rank r is
    processed, no pair of rank <= r can reappear, and skipping absent
    ranks is exact.  This precondition holds for every ``train_bpe``
    output by construction; hand-built merge lists whose parts are not
    single chars or earlier-merge products are outside the contract.

    ``"auto"`` (default) picks ``"fold"`` up to ARROW_MERGE_THRESHOLD
    merges, ``"arrow"`` beyond — parity between the paths is pinned by
    tests against the independent-trainer goldens.
    """
    if id_cols is None:
        id_cols = ["doc_id"]
    if strategy == "auto":
        strategy = ("arrow" if len(merges) > ARROW_MERGE_THRESHOLD
                    else "fold")
    if strategy == "arrow":
        return _apply_bpe_arrow(docs, merges, text_col, out_col, id_cols)
    if strategy != "fold":
        raise ValueError("strategy must be auto|fold|arrow, got %r"
                         % strategy)
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


# Java regex \s (no UNICODE_CHARACTER_CLASS) is ASCII-only — the
# Python replica must NOT use \s, whose default is Unicode-wide.
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def _apply_bpe_arrow(docs: DataFrame, merges, text_col: str,
                     out_col: str, id_cols: List[str]) -> DataFrame:
    import re

    merge_rank = {(left, right): rk
                  for rk, left, right, _n in sorted(merges)}
    pair_of = {rk: (left, right)
               for rk, left, right, _n in sorted(merges)}
    ws_re = re.compile(_JAVA_WS)

    def encode_word(word: str) -> List[str]:
        syms = list(word[:-1]) + [word[-1] + "</w>"]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = merge_rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            left, right = pair_of[best]
            fused, out = left + right, []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = fused
                else:
                    out.append(s)
            syms = out
        return syms

    def tokenize(batches):
        cache: dict = {}

        def doc_tokens(text):
            if text is None:
                return None
            toks = [w for w in ws_re.split(text.lower()) if w]
            if not toks:
                return None
            out: List[str] = []
            for w in toks:
                got = cache.get(w)
                if got is None:
                    got = encode_word(w)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            res = pdf[id_cols].copy()
            res[out_col] = pdf[text_col].map(doc_tokens)
            yield res[res[out_col].notna()]

    out_schema = ", ".join(
        "`%s` %s" % (f.name, f.dataType.simpleString())
        for f in docs.select(*id_cols).schema.fields)
    out_schema += ", `%s` array<string>" % out_col
    return (docs.select(*id_cols, text_col)
            .mapInPandas(tokenize, schema=out_schema))
