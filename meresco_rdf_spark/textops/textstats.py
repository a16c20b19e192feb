"""Text analysis operators: tokenization, language-ID, quality scoring,
fingerprinting.  All pure ``pyspark.sql.functions`` column expressions
(whole-stage codegen, zero Python) chosen so a DuckDB oracle can compute
the identical values — integer/string outputs only, no float formulas.

Scale: every operator here is narrow (per-row); the only shuffles are the
aggregations a caller adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Per-language stopword marker sets for the n-gram/stopword language
# heuristic.  Deliberately tiny and public-domain: function words that are
# near-unique to each language.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "nicht", "mit", "ist", "ein", "eine", "für"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "des"],
    "es": ["el", "los", "las", "es", "una", "para", "por", "con", "del", "como"],
    "nl": ["de", "het", "een", "en", "van", "niet", "met", "voor", "naar", "ook"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "nl"]


def tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def bpe_ish_tokens(col: Column) -> Column:
    """Sub-word-ish tokens via a BPE-flavored regex: word pieces split at
    letter/digit boundaries plus standalone punctuation — a deterministic
    stand-in for a real tokenizer's pre-tokenization pass."""
    return F.filter(
        F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda x: (x != "") & (x != " "))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def normalized_text(col: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, non-alnum runs
    collapsed to single spaces, trimmed."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (md5 exists verbatim in DuckDB -> oracle-parity)."""
    return F.md5(normalized_text(col))


def stopword_count(col: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(arr, x)))


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_count(col, words)
            for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """Stopword-ratio language guess: the language with the most marker
    hits wins; ties break by LANG_PRIORITY order; zero hits -> 'und'."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse priority so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def repetition_features(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Gopher-style repetition statistics per document: how much of the
    text is one token or one bigram repeated.  High top-token / top-bigram
    concentration is the classic boilerplate/spam signal used to filter
    LLM pretraining corpora (Rae et al. 2021 §A1.1).

    Columns out (all BIGINT, exact — oracle-hashable):
    ``id_col, n_tokens, top_token_count, n_bigrams, top_bigram_count``.

    Plan shape: the tokens/bigram arrays are built row-local (codegen),
    then ONE explode + two-level hash aggregation per granularity — the
    mode-of-a-group computed as ``groupBy(doc, term).count`` followed by
    ``max`` per doc.  Both aggregations are partial-aggregatable (map-side
    combine collapses each partition's duplicate (doc, term) pairs before
    the exchange), and the shuffle key (doc_id, term) is near-unique so
    there is no skew: this survives documents of any size and corpora of
    any row count.  Empty documents keep a row via the left join
    (counts coalesced to 0).
    """
    toks = tokens(F.col(text_col))
    base = (df.select(id_col, toks.alias("_toks"))
            .withColumn("n_tokens", F.size("_toks").cast("long")))
    # successor-pairing: token i concatenated with token i+1 (element_at is
    # 1-based, the transform index 0-based -> i + 2)
    bigrams = F.transform(
        F.slice(F.col("_toks"), 1,
                F.greatest(F.size("_toks") - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit(" "),
                              F.element_at(F.col("_toks"), i + F.lit(2))))
    base = (base.withColumn("_bigrams", bigrams)
            .withColumn("n_bigrams", F.size("_bigrams").cast("long")))

    def top_count(col: str, alias: str) -> DataFrame:
        return (base.select(id_col, F.explode(col).alias("_t"))
                .groupBy(id_col, "_t").count()
                .groupBy(id_col).agg(F.max("count").alias(alias)))

    out = (base.select(id_col, "n_tokens", "n_bigrams")
           .join(top_count("_toks", "top_token_count"), id_col, "left")
           .join(top_count("_bigrams", "top_bigram_count"), id_col, "left"))
    return out.select(
        id_col, "n_tokens",
        F.coalesce("top_token_count", F.lit(0)).alias("top_token_count"),
        "n_bigrams",
        F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality features + aggregate score (0-5).  Components:

    - n_tokens, n_distinct (lexical diversity), n_chars
    - punct_count (non-alnum, non-space chars)
    - en_stopwords (natural-language-ness)
    - score: +1 each for: >=10 tokens, <=5000 tokens, distinct/total >= 1/2
      (integer cross-multiplied), punct <= chars/10, >=1 stopword
    """
    c = F.col(text_col)
    toks = tokens(c)
    out = df.withColumn("n_tokens", F.size(toks))
    out = out.withColumn("n_distinct", F.size(F.array_distinct(toks)))
    out = out.withColumn("n_chars", F.length(c))
    out = out.withColumn(
        "punct_count", F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", "")))
    out = out.withColumn("en_stopwords", stopword_count(c, LANG_STOPWORDS["en"]))
    score = (
        (F.col("n_tokens") >= 10).cast("int")
        + (F.col("n_tokens") <= 5000).cast("int")
        + (F.col("n_distinct") * 2 >= F.col("n_tokens")).cast("int")
        + (F.col("punct_count") * 10 <= F.col("n_chars")).cast("int")
        + (F.col("en_stopwords") >= 1).cast("int")
    )
    return out.withColumn("quality_score", score)
