#!/usr/bin/env python
"""The reference's flagship example (examples/basic.pl:21-31, "delete
deprecated accounts") recast Spark-first: adaptive chunk loop over a keyed
parquet table, per-chunk anti-filter, keyed-overwrite sink.

Run: python examples/chunked_delete.py [sf_dir] [out_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark import BatchChunker
from dbix_batchchunker_spark.session import get_spark
from dbix_batchchunker_spark.sources.parquet import keyed_overwrite


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/survivors"
    spark = get_spark(app_name="chunked_delete_example")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    deprecated = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000)

    def delete_chunk(bc: BatchChunker, chunk_df) -> None:
        keyed_overwrite(
            chunk_df.filter(~deprecated),
            out_dir,
            "o_orderkey",
            bucket_width=bc._ls.chunk_size,
        )

    bc = BatchChunker(
        df=orders,
        id_name="o_orderkey",
        coderef=delete_chunk,
        chunk_size=500,
        target_time=5,          # adapt chunk size toward 5 s chunks
        sleep=0,                # no replica to protect locally
        min_chunk_percent=0.5,  # resize on sparse ranges
        on_message=print,
    )
    bc.calculate_ranges()
    bc.execute()
    survivors = spark.read.parquet(out_dir)
    print(f"kept {survivors.count()} of {orders.count()} orders → {out_dir}")


if __name__ == "__main__":
    main()
