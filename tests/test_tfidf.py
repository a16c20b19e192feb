"""Fixed-point TF-IDF (textops/tfidf.py) vs a pure-Python model."""

import pytest

from meresco_rdf_spark.textops.tfidf import SCALE, term_frequencies, tfidf_topk

SCHEMA = "doc_id long, text string"

CORPUS = [
    (1, "spark spark shuffle join"),
    (2, "spark join window"),
    (3, "window window window sort"),
]


def docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, SCHEMA)


def _model_topk(rows, k, min_df=1):
    tf = {}
    for d, text in rows:
        for t in text.lower().split():
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len({d for d, _ in rows})
    out = {}
    for d in {d for d, _ in rows}:
        scored = sorted(
            ((tf[(dd, t)] * n * SCALE) // df[t], t)
            for (dd, t) in tf if dd == d and df[t] >= min_df)
        top = sorted(scored, key=lambda s: (-s[0], s[1]))[:k]
        out[d] = [(r + 1, t, s) for r, (s, t) in enumerate(top)]
    return out


def test_term_frequencies(spark):
    got = {(r.doc, r.term): r.tf
           for r in term_frequencies(docs(spark)).collect()}
    assert got[(1, "spark")] == 2
    assert got[(3, "window")] == 3
    assert (2, "shuffle") not in got


def test_topk_matches_model(spark):
    got = {}
    for r in tfidf_topk(docs(spark), k=2).collect():
        got.setdefault(r.doc, []).append((r.rnk, r.term, r.score))
    for d in got:
        got[d].sort()
    assert got == _model_topk(CORPUS, 2)


def test_rare_term_outranks_common_at_equal_tf(spark):
    rows = [(1, "alpha common"), (2, "common x"), (3, "common y")]
    top = {(r.doc, r.rnk): r.term
           for r in tfidf_topk(docs(spark, rows), k=2).collect()}
    assert top[(1, 1)] == "alpha"  # df=1 beats df=3 at tf=1


def test_ties_break_lexicographically(spark):
    rows = [(1, "beta alpha"), (2, "unrelated")]
    top = [r.term for r in tfidf_topk(docs(spark, rows), k=2)
           .filter("doc = 1").orderBy("rnk").collect()]
    assert top == ["alpha", "beta"]


def test_min_df_drops_hapax(spark):
    got = {r.term for r in tfidf_topk(docs(spark), k=5, min_df=2).collect()}
    assert "shuffle" not in got and "sort" not in got
    assert {"spark", "join", "window"} <= got


def test_k_bounds_output(spark):
    counts = {}
    for r in tfidf_topk(docs(spark), k=1).collect():
        counts[r.doc] = counts.get(r.doc, 0) + 1
    assert all(v == 1 for v in counts.values())


def test_bad_k_raises(spark):
    with pytest.raises(ValueError):
        tfidf_topk(docs(spark), k=0)
