"""Windowed co-occurrence counts (textops/collocations.py) vs a
pure-Python model."""

import pytest

from meresco_rdf_spark.textops.collocations import collocation_counts

SCHEMA = "doc_id long, text string"


def docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _model(rows, window, min_count=1):
    pair, uni = {}, {}
    for _, text in rows:
        t = text.lower().split()
        for i, x in enumerate(t):
            uni[x] = uni.get(x, 0) + 1
            for y in t[i + 1:i + 1 + window]:
                pair[(x, y)] = pair.get((x, y), 0) + 1
    n = sum(uni.values())
    return {(x, y): (c, uni[x], uni[y], n)
            for (x, y), c in pair.items() if c >= min_count}


def _run(spark, rows, window=2, min_count=1):
    got = collocation_counts(docs(spark, rows), window=window,
                             min_count=min_count)
    return {(r.x, r.y): (r.pair_count, r.x_count, r.y_count, r.n_tokens)
            for r in got.collect()}


def test_matches_model(spark):
    rows = [(1, "a b c a b"), (2, "b c d")]
    assert _run(spark, rows) == _model(rows, 2)


def test_window_one_is_adjacent_bigrams(spark):
    rows = [(1, "x y z")]
    got = _run(spark, rows, window=1)
    assert set(got) == {("x", "y"), ("y", "z")}


def test_pairs_are_directional(spark):
    rows = [(1, "p q")]
    got = _run(spark, rows, window=3)
    assert ("p", "q") in got and ("q", "p") not in got


def test_pairs_never_cross_documents(spark):
    rows = [(1, "a b"), (2, "c d")]
    got = _run(spark, rows, window=5)
    assert ("b", "c") not in got


def test_min_count_prunes_before_join(spark):
    rows = [(1, "a b a b c")]
    got = _run(spark, rows, window=1, min_count=2)
    # a->b occurs twice (pos 1 and 3); every other adjacent pair once
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == (2, 2, 2, 5)


def test_repeated_token_pairs_accumulate(spark):
    rows = [(1, "z z z")]
    got = _run(spark, rows, window=2)
    # pairs: (1,2),(1,3),(2,3) -> z,z count 3
    assert got[("z", "z")] == (3, 3, 3, 3)


def test_bad_window_raises(spark):
    with pytest.raises(ValueError):
        collocation_counts(docs(spark, [(1, "a")]), window=0)
