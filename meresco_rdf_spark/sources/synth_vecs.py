"""Deterministic synthetic embedding corpus for ANN benchmarks/tests.

Pure JVM column expressions over ``spark.range`` — no Python in the
generation path (same discipline as :mod:`synth_docs`), so corpus
synthesis never bottlenecks the operator being measured, and the same
(n_vecs, dim, n_clusters) always yields the same vectors independent of
partitioning or parallelism.

Cluster structure (so IVF/LSH bucketing has something real to find):
vector i = center(cluster(i)) + noise(i), componentwise in [-1, 1]:

- ``cluster(i) = pmod(xxhash64(i, 'c'), n_clusters)``
- ``center[j]  = u(xxhash64('ctr', cluster, j))`` — shared by members
- ``noise[j]   = spread * u(xxhash64(i, j))`` — per-vector jitter

with ``u(h) = pmod(h, 2001)/1000 - 1`` mapping a hash to [-1, 1].
Smaller ``spread`` -> tighter clusters -> higher ANN recall; the
default 0.35 gives non-trivial-but-recoverable structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _unit(h):
    # hash -> float in [-1, 1], 2001 distinct values
    return (F.pmod(h, F.lit(2001)) / F.lit(1000.0)) - F.lit(1.0)


def synthesize_embeddings(spark: SparkSession, n_vecs: int, dim: int = 64,
                          n_clusters: int = 32, spread: float = 0.35,
                          partitions: int | None = None) -> DataFrame:
    """``(vec_id long, embedding array<float>)`` with planted clusters."""
    base = spark.range(0, n_vecs, 1, partitions) if partitions else \
        spark.range(n_vecs)
    cluster = F.pmod(F.xxhash64(F.col("id"), F.lit("c")), F.lit(n_clusters))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            _unit(F.xxhash64(F.lit("ctr"), cluster, j))
            + F.lit(spread) * _unit(F.xxhash64(F.col("id"), j))
        ).cast("float"))
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))
