#!/usr/bin/env python
"""Capture the MID-QUERY plans of the star-contraction family — the parts
the returned frames hide behind localCheckpoint/toPandas materialization:

- dd09/components_star: one contraction round's ``small`` edge frame
  (the per-round repeated unit — its exchange/join count is the scale
  cost of the whole loop);
- bucket_graph_labels (dd03/dd15): the ``star`` edge-reduction frame.

Usage: PLAN_SUFFIX=before|after python scripts/explain_star_round.py <tag>
Writes plans/<tag>/dd09_round_<suffix>.txt and plans/<tag>/dd03_star_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbix_batchchunker_spark.operators import dedup as D
    from dbix_batchchunker_spark.operators.registry import t
    from dbix_batchchunker_spark.session import get_spark

    spark = get_spark(
        app_name="explain-star",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = D._spread(t(spark, sf_dir, "documents"), "doc_id", "text")
    entries = D._band_entries(D.minhash_signatures(docs)).persist()

    # the dd03/dd15 star edge reduction, exactly as bucket_graph_labels
    # builds it — both shapes inlined so either can be captured from any
    # tree state: suffix "before" = the r17 groupBy+self-join form,
    # anything else = the r18 window form.
    new_shape = suffix != "before"
    if new_shape:
        star = (
            entries.withColumn(
                "bmin",
                F.min("doc_id").over(Window.partitionBy("band", "bucket")),
            )
            .where(F.col("doc_id") != F.col("bmin"))
            .select(F.col("bmin").alias("src"), F.col("doc_id").alias("dst"))
            .distinct()
        )
    else:
        star = (
            entries.join(
                entries.groupBy("band", "bucket").agg(
                    F.min("doc_id").alias("bmin")
                ),
                ["band", "bucket"],
            )
            .where(F.col("doc_id") != F.col("bmin"))
            .select(F.col("bmin").alias("src"), F.col("doc_id").alias("dst"))
            .distinct()
        )
    with open(os.path.join(outdir, f"dd03_star_{suffix}.txt"), "w") as fh:
        fh.write(star._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))

    # ONE components_star round's small-star edge frame: run the public
    # loop with max_rounds=1 but capture the plan by reproducing the round
    # body on the normalized E — keyed off the installed source so before
    # and after trees each capture their own shape.
    ids = entries.select(F.col("doc_id").alias("id")).distinct()
    E = (
        star.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("child"),
            F.least("src", "dst").alias("parent"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = E.select(
        F.col("child").alias("u"), F.col("parent").alias("w")
    ).union(E.select(F.col("parent").alias("u"), F.col("child").alias("w")))
    if new_shape:
        large = (
            sym.withColumn(
                "m", F.least(F.min("w").over(Window.partitionBy("u")), F.col("u"))
            )
            .where(F.col("w") > F.col("u"))
            .select(F.col("w").alias("child"), F.col("m").alias("parent"))
        )
        with_m = large.withColumn(
            "m", F.min("parent").over(Window.partitionBy("child"))
        )
        small = (
            with_m.select(
                F.explode(
                    F.when(
                        F.col("parent") != F.col("m"),
                        F.array(
                            F.struct(
                                F.col("child").alias("child"),
                                F.col("m").alias("parent"),
                            ),
                            F.struct(
                                F.col("parent").alias("child"),
                                F.col("m").alias("parent"),
                            ),
                        ),
                    ).otherwise(
                        F.array(
                            F.struct(
                                F.col("child").alias("child"),
                                F.col("m").alias("parent"),
                            )
                        )
                    )
                ).alias("e")
            )
            .select("e.child", "e.parent")
            .distinct()
        )
    else:
        m_l = sym.groupBy("u").agg(F.min("w").alias("mn"))
        m_l = m_l.select("u", F.least("mn", "u").alias("m"))
        large = (
            sym.where(F.col("w") > F.col("u"))
            .join(m_l, "u")
            .select(F.col("w").alias("child"), F.col("m").alias("parent"))
            .distinct()
        )
        m_s = large.groupBy("child").agg(F.min("parent").alias("m"))
        small = (
            large.join(m_s, "child")
            .where(F.col("parent") != F.col("m"))
            .select(F.col("parent").alias("child"), F.col("m").alias("parent"))
            .union(m_s.select(F.col("child"), F.col("m").alias("parent")))
            .distinct()
        )
    with open(os.path.join(outdir, f"dd09_round_{suffix}.txt"), "w") as fh:
        fh.write(small._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    print("wrote", outdir, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
