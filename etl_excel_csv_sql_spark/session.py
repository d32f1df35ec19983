"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and merely *parameterized*
for local testing:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) so the
  same plans survive 1000× data growth without hand-tuning;
- shuffle partitions default to cores locally but should be ~2-3× total
  cluster cores on a real deployment (override via ``conf``);
- Arrow enabled so any Pandas-UDF escape hatch is batch-vectorized;
- UTC session timezone so timestamp semantics are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Scale-oriented defaults; every one is overridable via ``get_spark(conf=...)``.
DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: re-plan post-shuffle (partition coalescing, skew
    # splitting, dynamic broadcast) — the main lever that keeps one static
    # plan viable from sf0.001 tests to 100 TB production.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Sized for local[32]; set ~2-3x total executor cores on a cluster.
    "spark.sql.shuffle.partitions": "32",
    # 128 MiB input splits — parquet-friendly, keeps task count sane at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp behavior everywhere.
    "spark.sql.session.timeZone": "UTC",
    # Keep parquet scans aggressive: pushdown + vectorized reader are on by
    # default in Spark 4 but we pin them to guard against env overrides.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
}


def get_spark(
    app_name: str = "etl-excel-csv-sql-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults.

    ``master`` resolution: explicit arg > ``$SPARK_GRAFT_CPUS`` (local[N])
    > ``local[*]``. On a real cluster, pass ``master=None`` and launch via
    spark-submit — ``getOrCreate`` then inherits the cluster master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = {**DEFAULT_CONF, **(conf or {})}
    if master.startswith("local") and "spark.driver.memory" not in merged:
        # In local mode the driver JVM IS every executor; Spark's legacy
        # 1g default starves 32 task threads and OOMs shuffles that any
        # real per-core memory budget absorbs (found by the 10x scale
        # probe, r6). ~0.4 GB/thread mirrors a lean cluster executor.
        # Only effective when this call actually launches the JVM;
        # override via $SPARK_GRAFT_DRIVER_MEM or conf.
        merged["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "12g"
        )
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
