"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute-force cosine top-k** — exact baseline: a crossJoin between the
  (broadcast) query set and the corpus, the dot product computed JVM-side
  with ``F.zip_with`` + ``F.aggregate`` in double precision, top-k per
  query via ``min_by``-style window.  Cost: |Q| x |corpus| — right when
  |Q| is small (the usual "probe" shape) or corpus chunks are scanned
  once.
- **random-hyperplane LSH** (sign-LSH) — the scale path: each vector gets
  a ``n_planes``-bit sign signature against deterministic pseudo-random
  hyperplanes (components derived from ``xxhash64(dim, plane)`` — no
  stored model, reproducible on any executor); candidates share a
  signature band; exact cosine re-ranks.  This is the IVF-style
  bucket-then-verify layout: the shuffle key is the bucket id, corpus
  size per bucket drops ~2^-bits.

All arithmetic is double; cosines are rounded to 6 decimals so results
are stable across accumulation orders (and match SQL oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of :func:`cosine`: one numpy float64 batch
    per Arrow chunk instead of an interpreted fold per row.  Same
    float64 math; summation order differs (SIMD/pairwise vs sequential),
    so agreement with the expression twin is to ~1e-12 relative — the
    6-decimal rounding every caller applies absorbs that except exactly
    at a rounding boundary.  Oracle-checked paths keep the expression
    twin; bulk re-ranking uses this one."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def cos(va, vb):  # two pd.Series of list<float> -> pd.Series of double
        if len(va) == 0:
            return pd.Series([], dtype=float)
        mat_a = np.array([np.asarray(v, dtype=np.float64) for v in va])
        mat_b = np.array([np.asarray(v, dtype=np.float64) for v in vb])
        num = (mat_a * mat_b).sum(axis=1)
        den = np.sqrt((mat_a * mat_a).sum(axis=1)) \
            * np.sqrt((mat_b * mat_b).sum(axis=1))
        return pd.Series(num / den)

    return cos(a, b)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-id matches).

    Output: (query_id, neighbor_id, cos) — cos rounded to 6 decimals;
    ties broken by neighbor id.  The query side is broadcast: the corpus
    is scanned exactly once regardless of |Q|."""
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def plane_signs(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix, derived driver-side from sha1
    of (plane, dim, seed) — storage-free, identical on every run/executor,
    shipped to tasks as constant literal arrays (tiny: n_planes x dim)."""
    import hashlib

    return [
        [1.0 if hashlib.sha1(b"%d|%d|%d" % (p, d, seed)).digest()[0] % 2 == 0
         else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def hyperplane_signature(vec: Column, n_planes: int, dim: int,
                         seed: int = 42) -> Column:
    """Sign-LSH signature as an ``n_planes``-char '0'/'1' string.
    sign bit p = (Σ_d v[d]·plane[p][d]) >= 0.

    Dim-robustness: the whole plane matrix enters the plan as ONE
    ``array<array<double>>`` literal consumed by ``F.transform`` — a
    single Literal node, so the expression size is O(1) in (planes, dim).
    The previous shape built one aggregate chain per plane with a
    dim-length ``F.array(F.lit...)`` each, which blows past the 64KB
    codegen method limit at production dims (768-4096 x 16+ planes).
    The fold is the same left-to-right sequential sum, so values (and the
    DuckDB oracle, which inlines the identical matrix) are bit-identical."""
    planes = F.lit(plane_signs(n_planes, dim, seed))
    return F.array_join(
        F.transform(
            planes,
            lambda p: F.when(
                F.aggregate(
                    F.zip_with(vec, p, lambda x, s: x.cast("double") * s),
                    F.lit(0.0), lambda acc, v: acc + v) >= 0,
                F.lit("1")).otherwise(F.lit("0"))),
        "")


def hyperplane_signature_arrow(vec: Column, n_planes: int, dim: int,
                               seed: int = 42) -> Column:
    """Arrow-vectorized twin of :func:`hyperplane_signature`: one numpy
    float64 matmul per batch (~100x the interpreted higher-order-function
    chain at production dims).  Output-identical on real data (asserted in
    tests); the only theoretical divergence is a projection within ~1e-12
    of exactly 0, where summation order could flip the sign — use the
    expression twin when bit-parity with a sequential-fold oracle must be
    unconditional."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StringType

    planes = np.array(plane_signs(n_planes, dim, seed), dtype=np.float64)

    @F.pandas_udf(StringType())
    def signature(vecs):  # pd.Series of list<float> -> pd.Series of str
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        bits = (mat @ planes.T) >= 0  # (batch, n_planes) bool
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits])

    return signature(vec)


def _banded_ids(df: DataFrame, src_id: str, out_id: str, vec_col: str,
                sig_fn, n_planes: int, dim: int, bands: int) -> DataFrame:
    """(out_id, band_id, band_bits) — the ONLY columns that ride the band
    exchange.  The embedding array is deliberately dropped before the
    explode: carrying it would shuffle O(rows x bands x dim x 8B) — at
    dim 768-4096 the vector bytes dominate the exchange (the same
    anti-pattern class as shuffling MinHash shingle arrays,
    dedup.py banding).  Vectors are re-joined onto the (much smaller)
    candidate set instead."""
    width = n_planes // bands
    sig = sig_fn(F.col(vec_col), n_planes, dim)
    return df.select(
        F.col(src_id).alias(out_id),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_id"),
                F.substring(sig, b * width + 1, width).alias("band_bits"))
            for b in range(bands)
        ])).alias("band"),
    ).select(out_id, "band.band_id", "band.band_bits")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_planes: int = 8,
             dim: int = 64, bands: int = 4,
             use_arrow: bool = False,
             broadcast_queries: bool = False) -> DataFrame:
    """Approximate top-k: sign-LSH banding for candidates, exact cosine
    re-rank.  Recall is tunable by bands/planes; candidates per query
    shrink ~2^(-planes/bands) of the corpus — the 100-TB-side win.

    Shuffle shape: the band exchange carries (id, band_id, band_bits)
    ONLY — never the embedding arrays (those would ride the exchange
    x bands, dominating bytes at production dims).  The corpus vectors
    re-join onto the candidate set (one O(corpus x dim) exchange instead
    of O(corpus x bands x dim)); the query vectors arrive either via a
    broadcast join (default — |Q| is probe-shaped) or, with
    ``broadcast_queries``, captured in the re-rank UDF's closure so they
    never ride candidate rows at all.

    ``use_arrow`` switches signature computation AND the cosine re-rank
    to the numpy-matmul twins (the production-dim path)."""
    if broadcast_queries and not use_arrow:
        raise ValueError("broadcast_queries requires use_arrow=True")
    sig_fn = hyperplane_signature_arrow if use_arrow else hyperplane_signature
    cosine_fn = cosine_arrow if use_arrow else cosine

    qb = _banded_ids(queries, query_id_col, "query_id", vec_col,
                     sig_fn, n_planes, dim, bands)
    cb = _banded_ids(corpus, id_col, "neighbor_id", vec_col,
                     sig_fn, n_planes, dim, bands)
    cand = (
        qb.join(cb, ["band_id", "band_bits"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id")
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    cand = cand.join(c_vecs, "neighbor_id")
    if broadcast_queries:
        qid_to_vec = {
            r[0]: r[1]
            for r in queries.select(query_id_col, vec_col).collect()}
        cos_fixed = _cosine_vs_captured_queries(qid_to_vec)
        scored = cand.withColumn(
            "cos", F.round(cos_fixed(F.col("query_id"), F.col("c_vec")), 6))
    else:
        q_vecs = F.broadcast(queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec")))
        scored = cand.join(q_vecs, "query_id").withColumn(
            "cos", F.round(cosine_fn(F.col("q_vec"), F.col("c_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_pivots(n_pivots: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random pivot vectors in [-1, 1]^dim (sha1-
    derived, data-independent — no training pass, reproducible on any
    executor and in SQL oracles).  The pivots induce a Voronoi coarse
    quantizer: IVF-flat bucketing without a stored model."""
    import hashlib

    return [
        [hashlib.sha1(b"ivf|%d|%d|%d" % (p, d, seed)).digest()[0] / 127.5 - 1.0
         for d in range(dim)]
        for p in range(n_pivots)
    ]


def _pivot_scores(vec: Column, n_pivots: int, dim: int,
                  seed: int = 42) -> Column:
    """array<double> of cos-proportional scores dot(v, pivot)/|pivot|
    (the |v| factor is constant per row, so argmax is unaffected)."""
    import math

    pivots = ivf_pivots(n_pivots, dim, seed)
    norms = [math.sqrt(sum(x * x for x in p)) for p in pivots]
    pivots_lit = F.lit(pivots)   # ONE nested-array literal (dim-robust)
    norms_lit = F.lit(norms)
    dots = F.transform(
        pivots_lit,
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, s: x.cast("double") * s),
            F.lit(0.0), lambda acc, v: acc + v))
    return F.zip_with(dots, norms_lit, lambda d, n: d / n)


def _normed_pivot_matrix(n_pivots: int, dim: int, seed: int):
    import numpy as np

    mat = np.array(ivf_pivots(n_pivots, dim, seed), dtype=np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _pivot_scores_arrow(vec: Column, n_pivots: int, dim: int,
                        seed: int = 42) -> Column:
    """Arrow-vectorized twin of :func:`_pivot_scores`: one numpy matmul
    per batch against the (tiny, closure-captured) normalized pivot
    matrix.  ~100x the interpreted per-pivot fold at production dims."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    pivots_t = _normed_pivot_matrix(n_pivots, dim, seed).T  # (dim, n_pivots)

    @F.pandas_udf(ArrayType(DoubleType()))
    def scores(vecs):  # pd.Series of list<float> -> pd.Series of list<double>
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(list(mat @ pivots_t))

    return scores(vec)


def ivf_bucket(vec: Column, n_pivots: int, dim: int, seed: int = 42) -> Column:
    """1-based index of the nearest pivot (first-max tie-break)."""
    scores = _pivot_scores(vec, n_pivots, dim, seed)
    return F.array_position(scores, F.array_max(scores)).cast("int")


def ivf_bucket_arrow(vec: Column, n_pivots: int, dim: int,
                     seed: int = 42) -> Column:
    """Arrow-vectorized twin of :func:`ivf_bucket` (numpy argmax keeps
    the same first-max tie-break).  Bucket-identical to the expression
    twin unless two pivot scores tie within float summation-order noise
    (~1e-12 relative) — asserted over the synthetic corpus in tests."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType

    pivots_t = _normed_pivot_matrix(n_pivots, dim, seed).T

    @F.pandas_udf(IntegerType())
    def bucket(vecs):  # pd.Series of list<float> -> pd.Series of int
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series((mat @ pivots_t).argmax(axis=1) + 1).astype("int32")

    return bucket(vec)


def _cosine_vs_captured_queries(qid_to_vec: dict) -> "callable":
    """pandas_udf (query_id, c_vec) -> cosine, with the query vectors
    captured in the closure instead of riding every candidate row.

    The re-rank's Arrow volume is O(candidates x 2 x dim) when both
    vectors travel per row — and the q_vec half is pure duplication
    (|Q| distinct vectors copied candidates/|Q| times each).  Capturing
    the query matrix halves the dominant pipe volume at corpus scale.
    Same float64 elementwise-multiply + row-sum as :func:`cosine_arrow`,
    so values are bit-identical."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    qids = list(qid_to_vec)
    qmat = np.array([np.asarray(qid_to_vec[q], dtype=np.float64)
                     for q in qids])
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    pos_of = {q: i for i, q in enumerate(qids)}

    @F.pandas_udf(DoubleType())
    def cos(qid, cvecs):  # (pd.Series, pd.Series of list<float>)
        if len(qid) == 0:
            return pd.Series([], dtype=float)
        pos = qid.map(pos_of).to_numpy()
        mat_q = qmat[pos]
        mat_c = np.array([np.asarray(v, dtype=np.float64) for v in cvecs])
        num = (mat_q * mat_c).sum(axis=1)
        den = qnorm[pos] * np.sqrt((mat_c * mat_c).sum(axis=1))
        return pd.Series(num / den)

    return cos


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_pivots: int = 8,
             probes: int = 2, dim: int = 64, seed: int = 42,
             use_arrow: bool = False,
             broadcast_queries: bool = False) -> DataFrame:
    """IVF-flat approximate top-k: Voronoi coarse quantization over
    deterministic pivots; each corpus vector lands in ONE inverted list
    (its nearest pivot), each query probes its ``probes`` nearest lists;
    exact cosine re-ranks the candidates.

    The complementary strategy to sign-LSH banding: candidates shrink to
    ~probes/n_pivots of the corpus, the shuffle key is the bucket id, and
    recall degrades gracefully with ``probes`` (probes = n_pivots ==
    exact).  Scale shape: one narrow bucket-assignment pass per side,
    one equi-join on bucket, top-k window per query.

    ``use_arrow`` switches bucket assignment, probe scoring, AND the
    cosine re-rank to the numpy-matmul twins — the corpus-scale path
    (higher-order functions don't codegen; measured ~10x end-to-end,
    BENCH/BASELINE.md).  The expression path stays the default because
    it is bit-reproducible against sequential-fold SQL oracles.

    ``broadcast_queries`` (requires ``use_arrow``) additionally collects
    the query set driver-side ONCE (same small-|Q| probe-shape
    assumption under which :func:`cosine_topk` broadcasts it) and
    captures the query matrix in the re-rank UDF's closure, so q_vec is
    never duplicated onto candidate rows: the re-rank's Arrow transfer
    halves and the candidate exchange carries only (query_id, bucket).
    Values are bit-identical to the plain Arrow path (same numpy
    elementwise-multiply + row-sum)."""
    if broadcast_queries and not use_arrow:
        raise ValueError("broadcast_queries requires use_arrow=True")
    bucket_fn = ivf_bucket_arrow if use_arrow else ivf_bucket
    scores_fn = _pivot_scores_arrow if use_arrow else _pivot_scores
    cosine_fn = cosine_arrow if use_arrow else cosine
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        bucket_fn(F.col(vec_col), n_pivots, dim, seed).alias("bucket"))
    q_cols = ["query_id"] if broadcast_queries else ["query_id", "q_vec"]
    q_scores = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        scores_fn(F.col(vec_col), n_pivots, dim, seed).alias("scores"))
    # top-`probes` pivot indices per query: explode scored (index, score)
    # pairs and keep the best `probes` rows
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("bucket"))
    q_buckets = (
        q_scores.select(
            "query_id", "q_vec",
            F.posexplode("scores").alias("pos", "score"))
        .withColumn("bucket", (F.col("pos") + 1).cast("int"))
        .withColumn("rnk", F.row_number().over(w_probe))
        .filter(F.col("rnk") <= probes)
        .select(*q_cols, "bucket")
    )
    # No dedup needed (unlike LSH banding): every corpus vector lives in
    # exactly ONE inverted list and a query's probe buckets are distinct
    # (row_number over distinct bucket ids), so (query_id, neighbor_id)
    # pairs are unique by construction.  A dropDuplicates here would be a
    # semantic no-op that costs a full exchange of the candidate set WITH
    # the c_vec arrays riding it — at 4M vecs x dim 64 that was an ~8 GB
    # shuffle, the dominant cost of the measured 4M scaling run.
    cand = (
        q_buckets.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if broadcast_queries:
        qid_to_vec = {
            r[0]: r[1]
            for r in queries.select(query_id_col, vec_col).collect()}
        cos_fixed = _cosine_vs_captured_queries(qid_to_vec)
        scored = cand.withColumn(
            "cos", F.round(cos_fixed(F.col("query_id"), F.col("c_vec")), 6))
    else:
        scored = cand.withColumn(
            "cos", F.round(cosine_fn(F.col("q_vec"), F.col("c_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", threshold: float = 0.95,
                 n_planes: int = 0, dim: int = 64, bands: int = 4) -> DataFrame:
    """All pairs with cosine >= threshold (a < b).  ``n_planes=0`` = exact
    self-join (quadratic — test scale); ``n_planes>0`` = sign-LSH banding
    first (scale path)."""
    left = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("v_a"))
    right = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("v_b"))
    if n_planes:
        # band exchange carries ids only; vectors re-join onto the
        # candidate pair set (two O(corpus x dim) exchanges instead of
        # O(corpus x bands x dim) riding the banded self-join)
        lb = _banded_ids(df, id_col, "a", vec_col,
                         hyperplane_signature, n_planes, dim, bands)
        rb = _banded_ids(df, id_col, "b", vec_col,
                         hyperplane_signature, n_planes, dim, bands)
        cand = (
            lb.join(rb, ["band_id", "band_bits"])
            .filter(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"])
            .select("a", "b")
            .join(left, "a")
            .join(right, "b")
        )
    else:
        cand = left.crossJoin(right).filter(F.col("a") < F.col("b"))
    return (
        cand.withColumn("cos", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
