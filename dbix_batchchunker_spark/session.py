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
        # Let AQE coalesce DOWN from a wide initial reducer count instead of
        # being capped at shuffle_partitions: heavy shuffles get real width,
        # small stages coalesce back to few tasks, so the knob scales with
        # data without hurting short queries. Measured (sf0.1, min-of-2,
        # 12-query heavy mix): 35.2 s -> 32.9 s at 256 vs unset, gains
        # concentrated in the shuffle-bound dedup family (dd02 6.05->5.75,
        # dd06 4.27->3.98, dd13 2.57->2.19, q23 1.97->1.71, sim03
        # 3.66->3.29), worst regression +0.09 s on a sub-second query (AQE
        # planning on more initial partitions). This is runtime sizing only
        # — plan shapes, Exchange counts, and stateful-streaming state-store
        # counts (bound to shuffle_partitions) are unchanged. At cluster
        # scale raise it with the data (tens of thousands at 100 TB); 8x
        # cores is the single-node sweet spot measured here.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * shuffle_partitions),
        )
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
