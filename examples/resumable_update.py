#!/usr/bin/env python
"""Resumable chunked processing with a wall-clock budget
(reference: max_runtime + cursor resume, t/dbic.t:504-544).

Run: python examples/resumable_update.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dbix_batchchunker_spark import BatchChunker
from dbix_batchchunker_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="resumable_update_example")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    processed = []

    def work(bc: BatchChunker, chunk_df) -> None:
        processed.append(
            chunk_df.agg(F.count(F.lit(1))).first()[0]
        )

    bc = BatchChunker(
        df=orders, id_name="o_orderkey", coderef=work,
        chunk_size=200, target_time=0, sleep=0.05, min_chunk_percent=0,
        max_runtime=2,  # seconds; loop stops mid-way
        on_message=print,
    )
    bc.calculate_ranges()
    bc.execute()
    print(f"run 1: {len(processed)} chunks, cursor at {bc.min_id}")

    bc.max_runtime = 0  # lift the budget and resume from the stored cursor
    bc.execute()
    print(f"run 2 done: {len(processed)} chunks total, cursor at {bc.min_id}")


if __name__ == "__main__":
    main()
