"""Dataset-assembly operators (textops/sampling.py + the repetition and
triangle additions): deterministic splits, stratified sampling, sequence
packing, repetition stats, triangle participation.

Ground truth is computed independently in the test (hashlib md5 / plain
Python models), never by re-running the operator's own expressions.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.operators.graph_algos import triangle_participation
from meresco_rdf_spark.textops.sampling import (
    assign_split,
    pack_sequences,
    split_thresholds,
    stratified_sample,
)
from meresco_rdf_spark.textops.textstats import repetition_features


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# ---------------------------------------------------------------- splits

def test_split_thresholds_literals():
    assert split_thresholds([("train", 80), ("val", 10), ("test", 10)]) == [
        ("train", "cccc"), ("val", "e666"), ("test", None)]
    assert split_thresholds([("all", 100)]) == [("all", None)]
    with pytest.raises(ValueError):
        split_thresholds([("a", 50), ("b", 40)])
    with pytest.raises(ValueError):
        split_thresholds([])


def test_assign_split_matches_independent_md5_model(spark):
    rows = [(i, "en", "x") for i in range(400)]
    got = {r["doc_id"]: r["split"]
           for r in assign_split(_docs(spark, rows), "doc_id").collect()}

    def expect(i):
        p = _md5(i)[:4]
        return "train" if p < "cccc" else ("val" if p < "e666" else "test")

    assert got == {i: expect(i) for i, _, _ in rows}
    # rough proportions at n=400
    n_train = sum(1 for v in got.values() if v == "train")
    assert 280 <= n_train <= 360


def test_assign_split_stable_under_corpus_growth(spark):
    """A document's split never changes as the corpus grows — the property
    that keeps eval sets uncontaminated under incremental ingestion."""
    small = assign_split(_docs(spark, [(i, "en", "x") for i in range(50)]),
                         "doc_id").collect()
    big = assign_split(_docs(spark, [(i, "en", "x") for i in range(500)]),
                       "doc_id").collect()
    big_map = {r["doc_id"]: r["split"] for r in big}
    for r in small:
        assert big_map[r["doc_id"]] == r["split"]


def test_assign_split_custom_weights(spark):
    rows = [(i, "en", "x") for i in range(200)]
    got = assign_split(_docs(spark, rows), "doc_id",
                       [("fit", 50), ("holdout", 50)]).collect()
    assert {r["split"] for r in got} == {"fit", "holdout"}
    for r in got:
        expected = "fit" if _md5(r["doc_id"])[:4] < "8000" else "holdout"
        assert r["split"] == expected


# ------------------------------------------------------------- stratified

def test_stratified_sample_exact_selection(spark):
    rows = [(i, "en" if i % 2 else "de", "x") for i in range(100)]
    got = stratified_sample(_docs(spark, rows), "lang", "doc_id", 7).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang in ("en", "de"):
        ids = [i for i, l, _ in rows if l == lang]
        expect = set(sorted(ids, key=_md5)[:7])
        assert by_lang[lang] == expect


def test_stratified_sample_small_stratum_keeps_all(spark):
    rows = [(1, "en", "x"), (2, "en", "x"), (3, "fr", "x")]
    got = stratified_sample(_docs(spark, rows), "lang", "doc_id", 10).collect()
    assert len(got) == 3


def test_stratified_sample_topk_agg_path_identical(spark):
    # hot-stratum salted-aggregation path == window path, row for row
    rows = [(i, "en" if i % 10 else "de", "x") for i in range(300)]
    docs = _docs(spark, rows)
    window_path = {(r["doc_id"], r["lang"]) for r in
                   stratified_sample(docs, "lang", "doc_id", 9).collect()}
    for s in (1, 4, 16):
        agg_path = {(r["doc_id"], r["lang"]) for r in
                    stratified_sample(docs, "lang", "doc_id", 9,
                                      salt_buckets=s).collect()}
        assert agg_path == window_path
    # schema preserved (same columns as the input)
    out = stratified_sample(docs, "lang", "doc_id", 3, salt_buckets=4)
    assert out.columns == docs.columns


def test_stratified_sample_topk_agg_small_stratum_keeps_all(spark):
    rows = [(1, "en", "x"), (2, "en", "x"), (3, "fr", "x")]
    got = stratified_sample(_docs(spark, rows), "lang", "doc_id", 10,
                            salt_buckets=4).collect()
    assert len(got) == 3


# ---------------------------------------------------------------- packing

def test_pack_sequences_reconstructs_concat_and_chunk(spark):
    rows = [(i, "en", " ".join(["w"] * (5 + 13 * i % 97))) for i in range(60)]
    out = pack_sequences(_docs(spark, rows), "doc_id", max_len=64).collect()
    # independent model: per bucket, md5-order concat + chunk every 64
    toks = {i: len(t.split()) for i, _, t in rows}
    by_bucket = {}
    for i in toks:
        by_bucket.setdefault(_md5(i)[:1], []).append(i)
    expect = {}
    for bucket, ids in by_bucket.items():
        cum = 0
        for i in sorted(ids, key=_md5):
            expect[i] = (bucket, cum // 64, cum % 64)
            cum += toks[i]
    got = {r["doc_id"]: (r["bucket"], r["pack_id"], r["pack_offset"])
           for r in out}
    assert got == expect
    for r in out:
        assert 0 <= r["pack_offset"] < 64
        assert r["n_tokens"] == toks[r["doc_id"]]


def test_pack_sequences_precounted_tokens_and_validation(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_tok int")
    out = pack_sequences(df, "doc_id", max_len=16,
                         token_count_col="n_tok").collect()
    assert {r["doc_id"]: r["n_tokens"] for r in out} == {1: 10, 2: 20}
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", max_len=0, token_count_col="n_tok")


# -------------------------------------------------------------- repetition

def test_repetition_features_hand_computed(spark):
    rows = [
        (1, "en", "a a a b"),          # top token a=3; bigrams: a a (x2), a b
        (2, "en", "x y x y x"),        # top token x=3; bigram x y (x2)
        (3, "en", "unique words only"),
        (4, "en", "solo"),             # 1 token, 0 bigrams
        (5, "en", "   "),              # empty after tokenization
    ]
    got = {r["doc_id"]: r for r in
           repetition_features(_docs(spark, rows)).collect()}
    assert len(got) == 5
    assert (got[1]["n_tokens"], got[1]["top_token_count"],
            got[1]["n_bigrams"], got[1]["top_bigram_count"]) == (4, 3, 3, 2)
    assert (got[2]["top_token_count"], got[2]["top_bigram_count"]) == (3, 2)
    assert (got[3]["top_token_count"], got[3]["top_bigram_count"]) == (1, 1)
    assert (got[4]["n_tokens"], got[4]["n_bigrams"],
            got[4]["top_bigram_count"]) == (1, 0, 0)
    assert (got[5]["n_tokens"], got[5]["top_token_count"]) == (0, 0)


# --------------------------------------------------------------- triangles

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_triangle_participation_basic(spark):
    # one triangle a-b-c plus a pendant edge c-d
    got = {r["node"]: r["n_triangles"] for r in triangle_participation(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    ).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_participation_ignores_direction_dups_loops(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
             ("c", "a"), ("a", "a")]
    got = {r["node"]: r["n_triangles"]
           for r in triangle_participation(_edges(spark, pairs)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_participation_k4(spark):
    # K4: every node sits in C(3,2) = 3 triangles, 4 triangles total
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for x in nodes for y in nodes if x < y]
    got = {r["node"]: r["n_triangles"]
           for r in triangle_participation(_edges(spark, pairs)).collect()}
    assert got == {n: 3 for n in nodes}


class TestWeightedSample:
    def _docs(self, spark, n=400):
        return spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "de") for i in range(n)],
            "doc_id long, lang string")

    def test_rate_zero_and_full(self, spark):
        from meresco_rdf_spark.textops.sampling import weighted_sample
        d = self._docs(spark)
        assert weighted_sample(d, 0).count() == 0
        assert weighted_sample(d, 1_000_000).count() == 400

    def test_rate_is_approximately_honored(self, spark):
        from meresco_rdf_spark.textops.sampling import weighted_sample
        n = weighted_sample(self._docs(spark, 2000), 250_000).count()
        assert 400 < n < 600  # 500 expected; md5 is uniform

    def test_per_row_rates_by_column(self, spark):
        from pyspark.sql import functions as F

        from meresco_rdf_spark.textops.sampling import weighted_sample
        rate = F.when(F.col("lang") == "en", 1_000_000).otherwise(0)
        got = weighted_sample(self._docs(spark), rate)
        assert {r.lang for r in got.collect()} == {"en"}
        assert got.count() == 200

    def test_deterministic_under_repartition(self, spark):
        from meresco_rdf_spark.textops.sampling import weighted_sample
        d = self._docs(spark, 1000)
        a = {r.doc_id for r in weighted_sample(d, 300_000).collect()}
        b = {r.doc_id
             for r in weighted_sample(d.repartition(17), 300_000).collect()}
        assert a == b

    def test_bad_rate_raises(self, spark):
        import pytest as _pytest

        from meresco_rdf_spark.textops.sampling import weighted_sample
        with _pytest.raises(ValueError):
            weighted_sample(self._docs(spark), 1_000_001)
