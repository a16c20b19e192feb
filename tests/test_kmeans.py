"""Trained IVF (fixed-point Lloyd k-means, textops/kmeans.py).

The operator's whole value proposition is EXACTNESS: integer
arithmetic makes the iterative training independent of partitioning,
summation order, and engine — so the tests pin (a) bit-identical
results across partition counts, (b) agreement with an independent
pure-Python implementation, (c) the documented edge semantics
(tie-breaks, empty buckets, train_on), and (d) the plan shape
(partial-aggregated centroid update, no sort-merge join, Arrow-only
Python)."""

import pytest
from pyspark.sql import functions as F

from meresco_rdf_spark.textops.kmeans import (
    SCALE,
    _trunc_div,
    fixed_point,
    ivf_kmeans_topk,
    kmeans_train,
)


def vec_df(spark, rows, n_parts=4):
    # rows: list of (id, [floats])
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").repartition(n_parts)


def _py_fixed(v, scale=SCALE):
    import math

    return [math.floor(float(x) * scale + 0.5) for x in v]


def _py_kmeans(rows, n_pivots, n_iter, scale=SCALE):
    """Independent pure-Python Lloyd on the fixed grid (exact ints)."""
    fixed = {i: _py_fixed(v, scale) for i, v in rows}
    cents = [list(fixed[i]) for i in sorted(fixed)[:n_pivots]]

    def assign(v, cs):
        best, best_d = None, None
        for j, c in enumerate(cs):
            d = sum(x * x for x in c) - 2 * sum(a * b for a, b in zip(v, c))
            if best_d is None or d < best_d:
                best, best_d = j, d
        return best

    for _ in range(n_iter):
        sums = {}
        for i, v in fixed.items():
            j = assign(v, cents)
            s, n = sums.get(j, ([0] * len(v), 0))
            sums[j] = ([a + b for a, b in zip(s, v)], n + 1)
        cents = [
            [_trunc_div(s, n) for s in sums[j][0]] if j in sums else cents[j]
            for j, (s, n) in ((j, sums.get(j, (None, None)))
                              for j in range(n_pivots))
        ]
    return cents


DATA = [
    (i, [((i * 7 + d * 13) % 29) / 7.0 - 2.0 for d in range(6)])
    for i in range(40)
]


def test_train_matches_pure_python_and_partitioning(spark):
    expected = _py_kmeans(DATA, n_pivots=4, n_iter=3)
    for parts in (1, 7):
        got = kmeans_train(vec_df(spark, DATA, parts), n_pivots=4, n_iter=3)
        assert got == expected


def test_fixed_point_round_half_up(spark):
    df = spark.createDataFrame(
        [(0, [0.4999995, -0.5, 1.25, 0.0])],
        "vec_id long, embedding array<float>")
    [row] = df.select(fixed_point("embedding", 4).alias("v")).collect()
    # floor(x*4 + 0.5): 0.4999995*4=1.999998 -> 2; -0.5*4=-2 -> floor(-1.5)
    # = -2; 1.25*4=5 -> 5 (half rounds UP); 0 -> 0
    assert list(row.v) == [2, -2, 5, 0]
    assert _py_fixed([0.4999995, -0.5, 1.25, 0.0], 4) == [2, -2, 5, 0]


def test_trunc_div_matches_engines():
    # DuckDB // and Spark div truncate toward zero; Python // floors
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3   # Python -7 // 2 == -4
    assert _trunc_div(-8, 2) == -4


def test_empty_buckets_keep_previous_centroid(spark):
    # two tight clusters far apart; 4 init centroids come from ids 0-3
    # (cluster A) -> after one iteration every point lands in ONE of the
    # A-side buckets and the vacated ones must keep their init vectors
    rows = ([(i, [0.0 + i * 1e-6, 0.0]) for i in range(4)]
            + [(i, [100.0, 100.0]) for i in range(4, 8)])
    cents = kmeans_train(vec_df(spark, rows), n_pivots=4, n_iter=1)
    expected = _py_kmeans(rows, n_pivots=4, n_iter=1)
    assert cents == expected
    init = [_py_fixed(v) for _, v in rows[:4]]
    # at least one bucket emptied and kept its init centroid verbatim
    assert any(c == i0 for c, i0 in zip(cents, init))


def test_assignment_tie_breaks_to_lowest_bucket(spark):
    # equidistant point between two identical-distance centroids
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])]
    out = ivf_kmeans_topk(
        vec_df(spark, rows),
        vec_df(spark, [(2, [1.0, 0.0])]).withColumnRenamed(
            "vec_id", "query_id"),
        k=3, n_pivots=2, n_iter=0, probes=1)
    got = {(r.query_id, r.neighbor_id, r.rank) for r in out.collect()}
    # probes=1 on the tie -> bucket 1 only; id 0 is its sole member
    assert got == {(2, 0, 1)}


def test_topk_ranks_by_exact_integer_l2(spark):
    rows = [(i, [float(i), 0.0]) for i in range(10)]
    queries = vec_df(spark, [(0, [0.0, 0.0])]).withColumnRenamed(
        "vec_id", "query_id")
    out = ivf_kmeans_topk(vec_df(spark, rows), queries, k=3, n_pivots=2,
                          n_iter=2, probes=2)
    got = [(r.neighbor_id, r.rank) for r in
           sorted(out.collect(), key=lambda r: r.rank)]
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_train_on_sample(spark):
    corpus = vec_df(spark, DATA)
    sample = corpus.filter(F.col("vec_id") % 2 == 0)
    queries = corpus.filter(F.col("vec_id") < 2).withColumnRenamed(
        "vec_id", "query_id")
    out = ivf_kmeans_topk(corpus, queries, k=4, n_pivots=4, n_iter=2,
                          probes=4, train_on=sample)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(1 <= r.rank <= 4 for r in rows)
    # probes == n_pivots => exhaustive: must equal the brute-force top-k
    fixed = {i: _py_fixed(v) for i, v in DATA}

    def brute(qid):
        q = fixed[qid]
        d = sorted(
            (sum(c * c for c in fixed[i])
             - 2 * sum(a * b for a, b in zip(fixed[i], q)), i)
            for i in fixed if i != qid)
        return [i for _, i in d[:4]]

    for qid in (0, 1):
        got = [r.neighbor_id for r in
               sorted((r for r in rows if r.query_id == qid),
                      key=lambda r: r.rank)]
        assert got == brute(qid)


def test_plan_shape(spark):
    corpus = vec_df(spark, DATA)
    queries = corpus.filter(F.col("vec_id") < 2).withColumnRenamed(
        "vec_id", "query_id")
    out = ivf_kmeans_topk(corpus, queries, k=3, n_pivots=4, n_iter=1,
                          probes=2)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan          # tiny probe side broadcasts
    assert "BatchEvalPython" not in plan        # Arrow-batched only
    # centroid-update aggregation is partial (map-side combine): two
    # HashAggregate levels around one exchange
    agg = (corpus.select(F.lit(1).alias("bucket"),
                         F.posexplode(fixed_point("embedding"))
                         .alias("pos", "val"))
           .groupBy("bucket", "pos")
           .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")))
    agg.collect()
    # AQE's toString appends the pre-adaptive plan — count the final only
    p = (agg._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert p.count("HashAggregate") == 2 and "partial_sum" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_n_iter_zero_uses_init_centroids(spark):
    got = kmeans_train(vec_df(spark, DATA), n_pivots=3, n_iter=0)
    assert got == [_py_fixed(v) for _, v in DATA[:3]]


def test_corpus_smaller_than_pivots_raises(spark):
    with pytest.raises(ValueError):
        kmeans_train(vec_df(spark, DATA[:2]), n_pivots=4)
