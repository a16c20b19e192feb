"""Hub-skew micro-bench for triangle orientation (VERDICT r02 #3).

Graph: one degree-10k star hub + a 2k-node random sparse graph (the
triangles live here) + edges connecting some leaves into the random
part.  Measures, for orient='id' vs orient='degree':

- wedge candidates actually produced by the e1(x,y) ⋈ e2(y,z) pivot join
  (the quantity that explodes on hubs), and
- wall time of the full per-node triangle count.

Expected: id-ordering gives the hub ~(d/2)^2 pivot wedges (~25M at
d=10k); degree-ordering gives the hub forward-degree 0, so its pivot
wedge count is 0 and total wedges track the random part only.

Usage: python tools/bench_triangle_skew.py [hub_degree]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    hub_degree = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

    from pyspark.sql import functions as F

    from meresco_rdf_spark.operators.graph_algos import (
        oriented_edges,
        triangle_participation,
    )
    from meresco_rdf_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # star hub: node "m_hub" connected to d leaves whose ids straddle it
    # lexicographically (half "a_leaf_*", half "z_leaf_*") — the
    # adversarial-but-realistic case where id order says nothing about
    # topology, so id-orientation leaves ~d/2 edges pointing in and ~d/2
    # pointing out of the hub -> ~(d/2)^2 pivot wedges.
    hub = spark.range(hub_degree).select(
        F.lit("m_hub").alias("src"),
        F.concat(F.when(F.col("id") % 2 == 0, F.lit("a_leaf_"))
                 .otherwise(F.lit("z_leaf_")), F.col("id")).alias("dst"))
    # sparse random part: 2k nodes, ~6k edges (deterministic xxhash-derived)
    rnd = spark.range(6_000).select(
        F.concat(F.lit("n"), (F.xxhash64("id") % 2000 + 2000) % 2000)
        .alias("src"),
        F.concat(F.lit("n"), (F.xxhash64("id", F.lit(1)) % 2000 + 2000) % 2000)
        .alias("dst"))
    # leaves wired into the random part so hub edges participate in wedges
    cross = spark.range(2_000).select(
        F.concat(F.when(F.col("id") % 2 == 0, F.lit("a_leaf_"))
                 .otherwise(F.lit("z_leaf_")), F.col("id")).alias("src"),
        F.concat(F.lit("n"), F.col("id")).alias("dst"))
    edges = hub.unionByName(rnd).unionByName(cross).persist()
    n_edges = edges.count()

    report = {"hub_degree": hub_degree, "n_edges": n_edges, "modes": {}}
    for orient in ("id", "degree"):
        ori = oriented_edges(edges, orient=orient).persist()
        ori.count()
        e1 = ori.select(F.col("u").alias("x"), F.col("v").alias("y"))
        e2 = ori.select(F.col("u").alias("y"), F.col("v").alias("z"))
        t0 = time.monotonic()
        wedges = e1.join(e2, "y").count()
        hub_wedges = (
            e1.filter(F.col("y") == "m_hub")
            .join(e2.filter(F.col("y") == "m_hub"), "y").count())
        t1 = time.monotonic()
        tri = triangle_participation(edges, orient=orient)
        total_tri = tri.agg(F.sum("n_triangles")).collect()[0][0]
        t2 = time.monotonic()
        report["modes"][orient] = {
            "wedges": wedges,
            "hub_pivot_wedges": hub_wedges,
            "wedge_join_sec": round(t1 - t0, 2),
            "triangle_count_sec": round(t2 - t1, 2),
            "triangle_participations": total_tri,
        }
        ori.unpersist()
    same = (report["modes"]["id"]["triangle_participations"]
            == report["modes"]["degree"]["triangle_participations"])
    report["orientation_invariant"] = same
    print(json.dumps(report))
    spark.stop()
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
