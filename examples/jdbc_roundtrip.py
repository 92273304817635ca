#!/usr/bin/env python
"""End-to-end JDBC round trip against embedded Derby (ships in Spark's
jars — no external database needed): bulk-write a table over JDBC, run an
adaptive chunker to discover data-driven ranges, then read the table back
with one JDBC partition per chunk range.

This is the cluster deployment shape for the reference's DBI modes
(BatchChunker.pm:1297-1350): the database serves N independent indexed
range scans while Spark schedules N partitions across executors.

Against a table that carries a real PRIMARY KEY (Spark's JDBC writer
cannot declare one, so this example passes id_name explicitly),
``sources.jdbc.chunker_from_jdbc(spark, url, table, properties=...)``
resolves id_name from the PK metadata — the reference's id
auto-introspection (tested end-to-end in tests/test_sources_and_plans.py).

Run: python examples/jdbc_roundtrip.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark import BatchChunker
from dbix_batchchunker_spark.session import get_spark
from dbix_batchchunker_spark.sources.jdbc import read_chunked, write_chunked


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="jdbc_roundtrip_example")
    db = tempfile.mkdtemp() + "/derby/db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_chunked(orders, url, "orders", mode="overwrite",
                  num_partitions=4, properties=props)

    # Chunk the id space from the table's actual min/max (one agg job),
    # then turn each chunk range into a JDBC partition.
    bc = BatchChunker(
        df=orders, id_name="o_orderkey", coderef=lambda bc, cdf: None,
        chunk_size=500, target_time=0, sleep=0,
    )
    bc.calculate_ranges()
    executed = list(bc.chunk_ranges())

    # One JDBC partition per executed range; Spark quotes written columns,
    # so the predicate identifier is quoted for Derby's case folding.
    df = read_chunked(spark, url, "orders", "o_orderkey", executed,
                      properties=props, quote='"')
    per = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .orderBy("pid")
    )
    print(f"chunks={len(executed)} partitions={df.rdd.getNumPartitions()}")
    per.show(8)
    assert df.count() == orders.count()
    print("round trip OK")


if __name__ == "__main__":
    main()
