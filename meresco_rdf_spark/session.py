"""SparkSession factory with the engine's standard scale configuration.

Defaults encode the 100-TB design posture (BASELINE.json north_star):
AQE on (runtime re-planning + skew-join splitting), Arrow for every
pandas UDF boundary, and shuffle partitioning sized by caller.  On a real
cluster these arrive via spark-submit --conf; the factory only sets what
the engine semantically relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS = {
    # runtime re-planning: partition coalescing, skew-join splitting,
    # dynamic broadcast-join conversion — required by the skew posture
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas_udf / mapInPandas / applyInPandas
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # deterministic timestamp behavior across JVM/pandas
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app_name: str = "meresco_rdf_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or "local[%s]" % cpus)
    # local mode runs every task inside the driver JVM — the 1g default
    # heap OOMs under 32 concurrent hash-agg tasks.  Keep the heap MODERATE:
    # oversized heaps (32g) put this kernel into page-allocation storms
    # (measured 85% system time, 5x wall).  8g = ~250MB per task at 32
    # threads, ample for the spill-aware operators.  Honored only if this
    # builder launches the JVM (i.e. set before the first session).
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    for key, value in ENGINE_CONFS.items():
        builder = builder.config(key, value)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions if shuffle_partitions is not None else cpus))
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode equivalent of
    ``spark-submit --py-files``).  Python workers don't inherit the
    driver's ``sys.path``, so a driver importing the package from a
    non-cwd location would otherwise hit ModuleNotFoundError inside any
    pandas UDF.  Idempotent per session."""
    sc = spark.sparkContext
    if getattr(sc, "_meresco_rdf_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="meresco_rdf_spark_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._meresco_rdf_spark_shipped = True
