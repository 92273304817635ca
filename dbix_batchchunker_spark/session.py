"""SparkSession factory tuned for this engine.

Defaults follow the 100 TB posture (SURVEY.md §2.C): AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow enabled for
the Pandas-UDF slow path, UTC session timezone for deterministic timestamp
semantics, and shuffle partitions sized to the local core count rather than
the 200 default (on a real cluster, leave AQE to coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbix_batchchunker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE initialPartitionNum stays UNSET by default — a measured
        # two-sided result (SCALING.md "One-decade rehearsal" follow-ups):
        # 8x cores improved a shuffle-bound heavy mix 35.2 -> 32.9 s at
        # sf0.1 (dd02/dd06/dd13/q23/sim03 each -6..15%), but regressed the
        # iterative/persist-heavy pipelines ~20% (dd03 2.59 -> 3.11, dd07
        # 2.64 -> 3.17 solo min-of-3: their many small shuffles launch 8x
        # tasks of trivial work that AQE's byte-sized coalescing does not
        # collapse), and the full 143-query suite read ~+5% with it on.
        # At cluster scale DO raise it with the data (tens of thousands of
        # initial partitions at 100 TB, where per-reducer bytes — not task
        # launch — dominate); pass it via extra_conf per workload.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # managed tables (bucketed joins) land outside the repo; static conf
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", f"/tmp/spark-warehouse-{os.getuid()}"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the testdata star schema; returns {name: DataFrame} and registers
    each as a temp view (so both DataFrame and spark.sql paths work)."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
