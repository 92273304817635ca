"""JDBC predicate generation, keyed-overwrite parquet sink, and physical-plan
quality assertions (pushdown / pruning / broadcast / codegen)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dbix_batchchunker_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=8)


# ---------------------------- jdbc helpers (no DB needed) -------------------


def test_chunk_predicates():
    from dbix_batchchunker_spark.sources.jdbc import chunk_predicates

    preds = chunk_predicates([(1, 10), (11, 20)], "id")
    assert preds == ["id BETWEEN 1 AND 10", "id BETWEEN 11 AND 20"]


def test_stride_ranges_cover_exactly():
    from dbix_batchchunker_spark.sources.jdbc import stride_ranges

    ranges = stride_ranges(5, 104, 7)
    covered = []
    for s, e in ranges:
        covered.extend(range(s, e + 1))
    assert covered == list(range(5, 105))
    assert len(ranges) <= 7


def test_dml_per_chunk_executes_on_partitions(spark, tmp_path):
    """Run the foreachPartition DML path against a real sqlite file DB."""
    import sqlite3

    from dbix_batchchunker_spark.sources.jdbc import execute_dml_per_chunk

    db_path = str(tmp_path / "dml.db")
    conn = sqlite3.connect(db_path)
    conn.execute("CREATE TABLE sink (id INTEGER, val TEXT)")
    conn.commit()
    conn.close()

    df = spark.range(0, 100).withColumn("val", F.concat(F.lit("v"), F.col("id")))

    def factory(path=db_path):
        import sqlite3 as s

        c = s.connect(path, timeout=60)
        c.execute("PRAGMA busy_timeout=60000")
        return c

    execute_dml_per_chunk(
        df.coalesce(1),  # sqlite: single writer
        factory,
        "INSERT INTO sink VALUES (?, ?)",
        lambda row: (row["id"], row["val"]),
        batch_size=16,
    )
    check = sqlite3.connect(db_path)
    n, = check.execute("SELECT COUNT(*) FROM sink").fetchone()
    assert n == 100


def test_adaptive_chunk_ranges_drive_jdbc_partitions(spark, tmp_path):
    """End-to-end JDBC contract (embedded Derby ships in Spark's jars):
    the ranges an ADAPTIVE chunker run actually executed become the
    read-side predicates — partition count == chunk count, and every
    partition holds exactly its chunk's id range."""
    import sqlite3

    from dbix_batchchunker_spark import BatchChunker
    from dbix_batchchunker_spark.sources.jdbc import read_chunked, write_chunked
    from pyspark.sql import functions as F

    # Skewed source: dense ids 0-999, sparse 1000-4999 (every 8th) → the
    # count probe resizes chunks, so executed ranges are non-uniform.
    ids = list(range(1000)) + list(range(1000, 5000, 8))
    src = str(tmp_path / "src.db")
    conn = sqlite3.connect(src)
    conn.execute("CREATE TABLE src (id INTEGER PRIMARY KEY)")
    conn.executemany("INSERT INTO src VALUES (?)", [(i,) for i in ids])
    conn.commit()
    conn.close()

    executed = []
    bc = BatchChunker(
        dbapi_connector=lambda: sqlite3.connect(src),
        coderef=lambda bc, start, end: executed.append((start, end)),
        count_stmt="SELECT COUNT(*) FROM src WHERE id BETWEEN ? AND ?",
        min_stmt="SELECT MIN(id) FROM src",
        max_stmt="SELECT MAX(id) FROM src",
        chunk_size=500,
        target_time=0,
        sleep=0,
    )
    bc.calculate_ranges()
    bc.execute()
    assert len(executed) > 2
    assert len({e - s for s, e in executed}) > 1, "resizing never engaged"

    url = f"jdbc:derby:{tmp_path}/derby/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    write_chunked(df, url, "src_jdbc", mode="overwrite",
                  num_partitions=2, properties=props)

    rc = read_chunked(spark, url, "src_jdbc", "id", executed,
                      properties=props, quote='"')
    assert rc.rdd.getNumPartitions() == len(executed)
    per = {
        r.pid: (r.lo, r.hi, r.n)
        for r in rc.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = 0
    for pid, (start, end) in enumerate(executed):
        if pid not in per:
            continue  # chunk range held no rows
        lo, hi, n = per[pid]
        assert start <= lo <= hi <= end, (pid, (start, end), (lo, hi))
        total += n
    assert total == len(ids)


def test_tx15_shared_window_agg_is_partial(spark):
    """tx15's shared-window detection must carry map-side partial counts —
    the shuffle ships per-window partials, not one row per (doc, window)
    occurrence, or the operator's dominant shuffle doubles at scale."""
    from dbix_batchchunker_spark.operators.text import tx15_dup_windows
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx15_dup_windows(spark, SF_DIR))
    assert "partial_count" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_is_equi_not_nested_loop(spark):
    """q33's two-sided inequality join must plan as a hash equi-join on the
    bucket key — a literal overlap theta-join would be
    BroadcastNestedLoopJoin, O(n·m) at any scale."""
    from dbix_batchchunker_spark.operators.rangejoin import (
        q33_interval_overlap_join,
    )
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q33_interval_overlap_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jdbc_id_auto_introspection(spark, tmp_path):
    """Constructing a chunker against a JDBC table with NO id_name must
    resolve it from primary-key metadata (reference BatchChunker.pm:509-513
    takes the first PK column; round-6 verdict 'What's missing' #3). Derby
    ships in Spark's jars, so the metadata path runs for real."""
    from dbix_batchchunker_spark.sources.jdbc import (
        chunker_from_jdbc,
        primary_key_columns,
    )

    url = f"jdbc:derby:{tmp_path}/derby_pk/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # Create a table WITH a primary key via the JVM (Spark's JDBC writer
    # cannot declare PKs), unquoted so Derby folds the names upper.
    jvm = spark._jvm
    jvm.java.lang.Class.forName(props["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE keyed (trackid INT PRIMARY KEY, v INT)")
    for i in range(0, 40):
        st.execute(f"INSERT INTO keyed VALUES ({i}, {i * 10})")
    st.close()
    conn.close()

    assert primary_key_columns(spark, url, "keyed", props) == ["TRACKID"]
    assert primary_key_columns(spark, url, "nonexistent", props) == []

    counts = []
    bc = chunker_from_jdbc(
        spark, url, "keyed", properties=props,
        coderef=lambda bc, cdf: counts.append(cdf.count()),
        chunk_size=15, target_time=0, sleep=0, min_chunk_percent=0,
        verbose=False,
    )
    assert bc.id_name == "TRACKID"
    assert bc.calculate_ranges()
    assert (bc.min_id, bc.max_id) == (0, 39)
    bc.execute()
    assert sum(counts) == 40

    # no PK → actionable error, not a silent guess
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE keyless (a INT, b INT)")
    st.close()
    conn.close()
    with pytest.raises(ValueError, match="no primary key"):
        chunker_from_jdbc(
            spark, url, "keyless", properties=props,
            coderef=lambda bc, cdf: None,
            chunk_size=10, target_time=0, sleep=0,
        )

    # same-named tables in two schemas: unqualified lookup must refuse to
    # guess (wrong-schema id_name would chunk on a non-key column);
    # schema-qualified lookup resolves each
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE SCHEMA s1")
    st.execute("CREATE SCHEMA s2")
    st.execute("CREATE TABLE s1.dup_t (ida INT PRIMARY KEY, v INT)")
    st.execute("CREATE TABLE s2.dup_t (idb INT PRIMARY KEY, v INT)")
    st.close()
    conn.close()
    with pytest.raises(ValueError, match="ambiguous across schemas"):
        primary_key_columns(spark, url, "dup_t", props)
    assert primary_key_columns(spark, url, "s1.dup_t", props) == ["IDA"]
    assert primary_key_columns(spark, url, "s2.dup_t", props) == ["IDB"]


# ---------------------------- parquet keyed overwrite -----------------------


def test_keyed_overwrite_replaces_only_touched_buckets(spark, tmp_path):
    from dbix_batchchunker_spark.sources.parquet import keyed_overwrite, read_keyed

    path = str(tmp_path / "keyed")
    base = spark.range(0, 100).withColumn("v", F.lit("old"))
    keyed_overwrite(base, path, "id", bucket_width=10)
    assert read_keyed(spark, path).count() == 100

    # rewrite only ids 20-39 (buckets 2 and 3) with new values
    patch = (
        spark.range(20, 40).withColumn("v", F.lit("new"))
    )
    keyed_overwrite(patch, path, "id", bucket_width=10)
    out = read_keyed(spark, path)
    assert out.count() == 100
    assert out.filter("v = 'new'").count() == 20
    assert out.filter("id < 20 AND v = 'old'").count() == 20


# ---------------------------- plan quality ---------------------------------


def test_filter_pushdown_reaches_scan(spark):
    from dbix_batchchunker_spark.operators.relational import q02_filter_predicates
    from dbix_batchchunker_spark.plans.explain import has_pushed_filter

    df = q02_filter_predicates(spark, SF_DIR)
    assert has_pushed_filter(df, "l_linestatus")


def test_chunk_between_filter_pushes_down(spark):
    """The chunker's BETWEEN filter must reach the parquet scan — this is
    what makes a chunk a cheap range read instead of a full pass."""
    from dbix_batchchunker_spark.plans.explain import has_pushed_filter

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    chunk = orders.filter(F.col("o_orderkey").between(100, 200))
    assert has_pushed_filter(chunk, "o_orderkey")


def test_column_pruning(spark):
    from dbix_batchchunker_spark.plans.explain import reads_only_columns

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    df = li.select("l_orderkey", "l_quantity")
    all_cols = set(li.columns)
    assert reads_only_columns(df, all_cols, {"l_orderkey", "l_quantity"})


def test_dim_join_is_broadcast(spark):
    from dbix_batchchunker_spark.operators.relational import q03_revenue_by_nation
    from dbix_batchchunker_spark.plans.explain import uses_broadcast_join

    assert uses_broadcast_join(q03_revenue_by_nation(spark, SF_DIR))


def test_aggregate_has_mapside_combine(spark):
    """The grouped aggregate must run as partial (map-side) + final
    HashAggregate — the shuffle carries per-group partials, not raw rows.
    (WholeStageCodegen spans only appear in the post-execution AQE plan, so
    partial_sum presence is the reliable pre-execution plan check.)"""
    from dbix_batchchunker_spark.operators.relational import q01_pricing_summary
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q01_pricing_summary(spark, SF_DIR))
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_sessionize_reuses_window_partitioning(spark):
    """q30's grouped aggregate must reuse the window's user_id hash
    partitioning — the ONLY hash exchange in the plan is the window's (the
    second exchange is the final orderBy's range partitioning). A plan that
    re-shuffles between Window and HashAggregate doubles the shuffle volume
    of the whole operator."""
    from dbix_batchchunker_spark.operators.advanced import q30_sessionize
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q30_sessionize(spark, SF_DIR))
    hash_exchanges = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(hash_exchanges) == 1, plan
    assert "Window" in plan and "HashAggregate" in plan


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Co-bucketed tables join with no Exchange on either side."""
    from dbix_batchchunker_spark.plans.explain import formatted_plan
    from dbix_batchchunker_spark.sources.bucketed import (
        cobucketed_join,
        write_bucketed,
    )

    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)

    left = spark.range(0, 10000).withColumn("v", F.col("id") % 7)
    right = spark.range(0, 10000).withColumn("w", F.col("id") % 3)
    write_bucketed(left, "bkt_left", "id", 8)
    write_bucketed(right, "bkt_right", "id", 8)

    # force the sort-merge path (tiny test tables would otherwise broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "bkt_left", "bkt_right", "id")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10000

        # contrast: the same join on unbucketed frames DOES shuffle
        plain = left.join(right.withColumnRenamed("w", "w2"), "id")
        assert "Exchange" in formatted_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_repetition_signals_plan_is_shuffle_free(spark):
    """tx12 computes per-doc bigram repetition with array HOFs precisely so
    the plan stays a pure map — no DATA-KEYED exchange (hash/range) may
    appear, or the operator stops scaling linearly. The one allowed
    exchange is the explicit round-robin spread off the scan (r18 §10:
    parallelizes the CPU-heavy map on narrow single-split inputs and
    passes already-wide scans through untouched) — it carries no key, so
    it can never become a skewed or quadratic-block shuffle."""
    from dbix_batchchunker_spark.operators.text import tx12_repetition
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx12_repetition(spark, SF_DIR))
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    spreads = plan.count("RoundRobinPartitioning")
    assert spreads <= 1, plan


def test_banded_range_join_is_equi_not_nested_loop(spark):
    """q32's whole point is the rewrite: a pure range predicate would plan
    as BroadcastNestedLoopJoin (O(n·m) comparisons); the banded form must
    plan as an EQUI hash join on the bucket id with the |Δts| residual as
    the join filter."""
    from dbix_batchchunker_spark.operators.rangejoin import q32_banded_range_join
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q32_banded_range_join(spark, SF_DIR))
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan, plan


def test_formats_roundtrip_preserves_values(spark, tmp_path):
    """orders round-trips through csv/json/orc with explicit schemas: same
    rows, same dtypes (timestamps included — csv/json serialize them as
    strings and the explicit schema restores them)."""
    from dbix_batchchunker_spark.sources.formats import read_any, write_any

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    expected = sorted(map(tuple, orders.collect()))
    for fmt in ("orc", "csv", "json"):
        path = str(tmp_path / f"orders_{fmt}")
        write_any(orders, path, fmt)
        back = read_any(spark, path, fmt, schema=orders.schema)
        assert back.schema == orders.schema, fmt
        assert sorted(map(tuple, back.collect())) == expected, fmt


def test_formats_text_requires_schema_and_convert_lands_columnar(spark, tmp_path):
    from dbix_batchchunker_spark.sources.formats import (
        convert,
        infer_schema_sample,
        read_any,
        write_any,
    )

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    src = str(tmp_path / "orders_csv")
    write_any(orders, src, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, src, "csv")
    schema = infer_schema_sample(spark, src, "csv", sample_files=1)
    assert set(f.name for f in schema.fields) == set(orders.columns)
    dst = str(tmp_path / "orders_parquet")
    back = convert(spark, src, "csv", dst, schema=orders.schema)
    assert back.count() == orders.count()
    assert back.schema == orders.schema


def test_mixture_sample_is_stateless_filter(spark):
    """sp01 must plan as scan → filter → project with NO hash exchange —
    the only Exchange is the final orderBy's range partitioning. A shuffle
    here would mean the sampler stopped being a stateless one-pass op."""
    from dbix_batchchunker_spark.operators.sampling import sp01_mixture_sample
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(sp01_mixture_sample(spark, SF_DIR))
    hash_exchanges = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert not hash_exchanges, plan
    assert "Filter" in plan

    # sp02 (weighted) must keep the identical stateless shape
    from dbix_batchchunker_spark.operators.sampling import sp02_weighted_sample

    plan2 = formatted_plan(sp02_weighted_sample(spark, SF_DIR))
    assert not [
        ln
        for ln in plan2.splitlines()
        if ln.strip().startswith("Arguments: hashpartitioning")
    ], plan2
    assert "Filter" in plan2


def test_vocab_topk_avoids_global_sort(spark):
    """tx14's top-k must run as TakeOrderedAndProject (per-partition heaps +
    merge), never a global Sort of the whole vocabulary."""
    from dbix_batchchunker_spark.operators.text import tx14_vocab
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx14_vocab(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion → multimodal contract: glob filter applied at
    listing time, oversize exclusion via the metadata length column,
    deterministic path-hash doc_id, and the payload flows straight into
    the Arrow-batched resize operator."""
    from dbix_batchchunker_spark.operators.multimodal import (
        resize_binary_column,
    )
    from dbix_batchchunker_spark.sources.binary import read_binary_dir

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.png").write_bytes(b"imagebytes-a" * 10)
    (d / "b.png").write_bytes(b"imagebytes-b" * 10)
    (d / "big.png").write_bytes(b"x" * 10_000)
    (d / "skip.txt").write_bytes(b"not an image")

    df = read_binary_dir(spark, str(d), "*.png", max_file_bytes=1_000)
    rows = df.collect()
    names = sorted(r.path.rsplit("/", 1)[-1] for r in rows)
    assert names == ["a.png", "b.png"]  # glob excluded .txt, cap excluded big
    assert all(isinstance(bytes(r.payload), bytes) and r.length == 120
               for r in rows)

    # doc_id is a pure function of the path: stable across reads
    again = {r.path: r.doc_id for r in
             read_binary_dir(spark, str(d), "*.png", 1_000).collect()}
    assert {r.path: r.doc_id for r in rows} == again

    resized = resize_binary_column(df, 4, 4).collect()
    assert len(resized) == 2 and all(len(bytes(r.resized)) <= 16 for r in resized)


def test_grouping_sets_single_expand_pass(spark):
    """q34's two subtotal dimensions must come from ONE Expand over one
    scan — not a union of two aggregations (which would scan+shuffle
    twice)."""
    from dbix_batchchunker_spark.operators.advanced import q34_grouping_sets
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q34_grouping_sets(spark, SF_DIR))
    assert "Expand" in plan
    # formatted output lists each node twice (tree + detail); count the
    # numbered detail headers.
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan
    assert "Union" not in plan


def test_bloom_prefilter_membership_is_broadcast(spark):
    """tx16's bitmap membership test must be a broadcast-hash join (the
    whole point: the corpus side never shuffles for the prefilter)."""
    from dbix_batchchunker_spark.operators.text import tx16_bloom_decontaminate
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx16_bloom_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_pivot_is_single_aggregation(spark):
    """q36 with a pinned value list must lower to one aggregate pass —
    no extra job or plan branch to discover pivot columns."""
    from dbix_batchchunker_spark.operators.advanced import q36_pivot_event_matrix
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q36_pivot_event_matrix(spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_composite_keyset_predicate_is_pushed(spark):
    """q38's lowered row-value comparison must reach the parquet scan as a
    pushed filter — the keyset property (O(page) cost) depends on it."""
    from dbix_batchchunker_spark.operators.advanced import q38_composite_keyset
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q38_composite_keyset(spark, SF_DIR))
    m = re.search(r"PushedFilters: \[(.*)\]", plan)
    assert m and "l_orderkey" in m.group(1), plan


def test_bpe_pair_count_plan_shape(spark):
    """tx18: pair explosion must partial-aggregate map-side (two
    HashAggregates around one exchange) and cut top-k with
    TakeOrderedAndProject — never a global sort of the full pair table."""
    from dbix_batchchunker_spark.operators.text import tx18_bpe_merge_pairs
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx18_bpe_merge_pairs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan  # map-side combine before the shuffle


def test_quantized_topk_probe_is_broadcast(spark):
    """sim08: the probe side must broadcast — the corpus side streams
    through unshuffled (same probe-bounded contract as sim01)."""
    from dbix_batchchunker_spark.operators.similarity import sim08_quantized_topk
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(sim08_quantized_topk(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_global_cumsum_two_phase_matches_naive_window(spark):
    """functions/prefix.with_global_cumsum must equal the single-partition
    window spelling on every row AND keep SinglePartition exchanges out of
    its plan — the point of the two-phase rewrite."""
    from pyspark.sql import Window

    from dbix_batchchunker_spark.functions.prefix import with_global_cumsum
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    # negative values on purpose: a max()-based per-partition total (the
    # round-7 review catch) is only exposed when running sums DIP
    df = spark.range(0, 997).selectExpr("id AS k", "(id * 37) % 101 - 50 AS v")
    got = with_global_cumsum(df, "k", "v", out_col="cum", num_partitions=7)
    naive = df.withColumn(
        "cum", F.sum("v").over(Window.orderBy("k"))
    )
    assert "SinglePartition" not in formatted_plan(got)
    g = {r.k: r.cum for r in got.collect()}
    n = {r.k: r.cum for r in naive.collect()}
    assert g == n


def test_global_rank_two_phase_matches_naive_window(spark):
    """functions/prefix.with_global_rank must equal ROW_NUMBER() OVER the
    unpartitioned order on every row, keep SinglePartition exchanges out
    of the RANK plan (the final one-row aggregate in consumers like tx22
    is a different, benign exchange), handle descending sort expressions,
    and reject a non-total order."""
    from pyspark.sql import Window

    from dbix_batchchunker_spark.functions.prefix import with_global_rank
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    df = spark.range(0, 500).selectExpr(
        "id AS k", "(id * 37) % 97 AS freq"
    )
    got = with_global_rank(
        df, [F.col("freq").desc(), F.col("k")], unique_cols=["k"],
        out_col="r", num_partitions=7,
    )
    assert "SinglePartition" not in formatted_plan(got)
    naive = df.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("freq").desc(), "k"))
    )
    assert {(x.k, x.r) for x in got.collect()} == {
        (x.k, x.r) for x in naive.collect()
    }
    # non-total order must raise, not silently pick a tie order
    import pytest as _pytest

    dup = spark.range(0, 100).selectExpr("id % 10 AS k")
    with _pytest.raises(ValueError, match="total order"):
        with_global_rank(dup, ["k"], num_partitions=4)
    # sort expressions without a uniqueness witness are rejected up front
    with _pytest.raises(ValueError, match="unique_cols"):
        with_global_rank(df, [F.col("freq").desc()], num_partitions=4)


def test_tx22_zipf_rank_tiers_agree_and_big_tier_has_no_1p_window(spark):
    """tx22's tiered rank (round-7 verdict #5): ABOVE the type threshold
    the vocabulary rank must not funnel through one task — the ranked
    intermediate's plan (rank stage only, before the benign one-row
    statistics aggregate) carries no SinglePartition at all — and the two
    tiers must produce IDENTICAL fit statistics on the same vocabulary."""
    from dbix_batchchunker_spark.functions.prefix import (
        release_cumsum_caches,
        with_global_rank,
    )
    from dbix_batchchunker_spark.operators.text import zipf_fit_over_vocab
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    vocab = spark.range(0, 3000).selectExpr(
        "concat('tok', id) AS token",
        # Zipf-ish frequencies with plenty of ties — the tie-break order
        # (freq DESC, token) must match across tiers for equality to hold
        "CAST(3000 / (id + 1) AS BIGINT) AS freq",
    )
    # the rank stage alone must be SinglePartition-free in the big tier
    ranked = with_global_rank(
        vocab, [F.col("freq").desc(), F.col("token")],
        unique_cols=["token"], out_col="__r",
    )
    assert "SinglePartition" not in formatted_plan(ranked)
    big = zipf_fit_over_vocab(vocab, two_phase_min_types=0).collect()[0]
    small = zipf_fit_over_vocab(vocab, two_phase_min_types=10**9).collect()[0]
    assert big.asDict() == small.asDict()
    assert big.n_types == 3000
    release_cumsum_caches()


def test_global_cumsum_rejects_duplicate_and_null_keys(spark):
    """A duplicated (or NULL) order key is not a total order: the default
    RANGE window frame would fold peers into both rows' totals with a
    partition-placement-dependent result (round-7 advice). The helper must
    raise, not silently pick an ordering — and the check must ride the
    existing totals job, catching duplicates ACROSS partition boundaries
    too (repartitionByRange co-locates equal keys)."""
    import pytest as _pytest

    from dbix_batchchunker_spark.functions.prefix import (
        release_cumsum_caches,
        with_global_cumsum,
    )

    dup = spark.range(0, 100).selectExpr("id % 50 AS k", "id AS v")
    with _pytest.raises(ValueError, match="unique"):
        with_global_cumsum(dup, "k", "v", num_partitions=5)
    withnull = spark.range(0, 20).selectExpr(
        "IF(id = 7, NULL, id) AS k", "id AS v"
    )
    with _pytest.raises(ValueError, match="unique"):
        with_global_cumsum(withnull, "k", "v", num_partitions=3)
    # the failed calls registered their persisted frames — release drains them
    assert release_cumsum_caches() >= 2
    assert release_cumsum_caches() == 0


def test_python_datasource_corpusgen(spark):
    """Spark 4 Python Data Source API: the corpusgen connector plans its
    own partitions (parallel scan), emits Arrow batches, and is
    DETERMINISTIC under repartitioning — same rows for 4 and 9 partitions."""
    from dbix_batchchunker_spark.sources.pydatasource import register

    register(spark)
    a = (
        spark.read.format("corpusgen")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    b = (
        spark.read.format("corpusgen")
        .option("rows", 500)
        .option("partitions", 9)
        .load()
    )
    assert a.rdd.getNumPartitions() == 4
    assert b.rdd.getNumPartitions() == 9
    ra = sorted((r.doc_id, r.text, r.lang) for r in a.collect())
    rb = sorted((r.doc_id, r.text, r.lang) for r in b.collect())
    assert ra == rb and len(ra) == 500
    # generated corpus flows into the operator family like any table
    from dbix_batchchunker_spark.operators.text import _tokens_spark

    toks = a.select(F.size(_tokens_spark("text")).alias("n")).agg(
        F.min("n"), F.max("n")
    ).first()
    assert toks[0] == toks[1] == 40


def test_python_stream_source_resumes_from_checkpoint(spark, tmp_path):
    """corpusfeed: the offset {'pos': high-water doc_id} lives in the
    checkpoint — a second drain RESUMES (new doc_ids continue where the
    first drain stopped), the connector form of the reference's cursor
    write-back + process_past_max contract. Rows equal the batch
    corpusgen source over the same id range."""
    from dbix_batchchunker_spark.sources.pydatasource import (
        register,
        register_feed,
    )

    register(spark)
    register_feed(spark)
    ck = str(tmp_path / "ck")
    got = []

    def drain():
        q = (
            spark.readStream.format("corpusfeed")
            .option("batchrows", 50)
            .load()
            .writeStream.foreachBatch(
                lambda b, i: got.extend(
                    (r.doc_id, r.text, r.lang) for r in b.collect()
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = len(got)
    assert n1 == 50 and max(r[0] for r in got) == 49
    drain()
    assert len(got) == n1 + 50
    assert max(r[0] for r in got) == 99  # resumed, not restarted
    batch_rows = sorted(
        (r.doc_id, r.text, r.lang)
        for r in spark.read.format("corpusgen")
        .option("rows", 100)
        .option("partitions", 3)
        .load()
        .collect()
    )
    assert sorted(got) == batch_rows  # stream == batch, row-identical


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Partition-layout contract at scale: a fact table written
    partitionBy(key) + a selective dim filter must trigger DYNAMIC
    partition pruning — the runtime subquery filter that keeps a 100 TB
    scan from reading partitions the joined dim excludes. Pinned here
    because it silently depends on the layout (partitioned write) and the
    join being planned with the dim on the build side."""
    fact_dir = str(tmp_path / "fact")
    spark.range(0, 5000).selectExpr(
        "id", "id % 20 AS part_key", "id * 2 AS v"
    ).write.partitionBy("part_key").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.range(0, 20).selectExpr(
        "id AS part_key", "CASE WHEN id < 3 THEN 'keep' ELSE 'drop' END AS tag"
    )
    joined = fact.join(dim.where("tag = 'keep'"), "part_key")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 750  # 3 of 20 partitions × 250 rows


def test_tx23_scan_prunes_to_source_and_text(spark):
    """tx23 reads only (source, text): the parquet ReadSchema must not
    carry doc_id/lang/n_chars — regex work rides a pruned scan."""
    from dbix_batchchunker_spark.operators.text import tx23_pii_scan
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx23_pii_scan(spark, SF_DIR))
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, plan
    assert all("doc_id" not in ln and "n_chars" not in ln for ln in rs), rs


def test_sim10_corpus_sweep_reads_codes_not_vectors(spark):
    """sim10's ADC sweep must join the CODES frame against broadcast
    tables (BroadcastNestedLoopJoin over the bounded probe side is the
    expected shape) and only re-read embeddings for the shortlist re-rank
    — the broadcast must appear, and no corpus×corpus CartesianProduct."""
    from dbix_batchchunker_spark.operators.similarity import sim10_pq_topk
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(sim10_pq_topk(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q46_lateral_decorrelates_to_window_group_limit(spark):
    """q46's correlated LATERAL LIMIT subquery must decorrelate: one
    WindowGroupLimit pass over orders + a hash join back — never a
    per-outer-row re-execution (no nested-loop/cartesian shape)."""
    from dbix_batchchunker_spark.operators.advanced import (
        q46_lateral_topn_per_customer,
    )
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q46_lateral_topn_per_customer(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sp07_waterfill_budgets_broadcast_single_window(spark):
    """sp07's corpus side must cross exactly ONE per-domain Window; the
    per-domain budget row arrives by broadcast (never a shuffled join),
    and the domain filter reaches the parquet scan."""
    from dbix_batchchunker_spark.operators.sampling import (
        sp07_mixture_waterfill,
    )
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(sp07_mixture_waterfill(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert re.search(r"PushedFilters: \[.*In\(lang", plan), plan


def test_q48_scd2_single_join_single_expand(spark):
    """q48 must decide every row's fate from ONE full-outer join and emit
    the (current, maybe-closed) pair via ONE Generate — a UNION shape
    would recompute the join per branch. Latest-per-key must fold into
    WindowGroupLimit (map-side top-1), not a full sort+filter."""
    from dbix_batchchunker_spark.operators.advanced import q48_scd2_merge
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q48_scd2_merge(spark, SF_DIR))
    assert len(re.findall(r"SortMergeJoin FullOuter \(\d+\)", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Generate\n", plan)) == 1, plan
    assert "WindowGroupLimit" in plan
    assert "Union" not in plan


def test_tx26_rarity_df_join_reuses_token_partitioning(spark):
    """tx26's join-back of the df table onto the exploded pairs must
    reuse the by-token hash partitioning both sides already have — the
    plan carries exactly the two intrinsic exchanges (by token for the
    df aggregate + join, by doc for the profile/final join) plus the
    presentation sort, and no per-row Python."""
    from dbix_batchchunker_spark.operators.text import tx26_token_rarity
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(tx26_token_rarity(spark, SF_DIR))
    hash_exchanges = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert hash_exchanges == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q49_zorder_key_is_codegen_no_python(spark):
    """The Morton key must evaluate as pure JVM expressions inside
    whole-stage codegen — stats arrive once via broadcast; no Python
    eval, no per-dimension re-shuffle of the corpus."""
    from dbix_batchchunker_spark.operators.advanced import q49_zorder_key
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q49_zorder_key(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    corpus_shuffles = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert corpus_shuffles == 0, plan


def test_mm06_header_parse_is_jvm_projection(spark):
    """mm06's IHDR parse must be a JVM projection over the binary column:
    exactly ONE Arrow stage (the binaryFile-stand-in synth), zero Python
    in the parse itself — dimension predicates can then push into the
    first JVM pass."""
    from dbix_batchchunker_spark.operators.multimodal import (
        mm06_png_header_metadata,
    )
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(mm06_png_header_metadata(spark, SF_DIR))
    arrow_stages = len(re.findall(r"\(\d+\) (?:MapInPandas|ArrowEvalPython)", plan))
    assert arrow_stages == 1, plan


def test_q53_null_aware_rewrite_has_no_nested_loop(spark):
    """q40's native NOT IN plans only as a BROADCAST null-aware anti join
    (BroadcastHashJoin LeftAnti with the NAAJ flag — Spark refuses to
    shuffle it); the q53 rewrite must carry a PLAIN equality anti join
    (shuffleable at 100 TB) and no nested-loop anywhere except the 1-row
    stats broadcast."""
    from dbix_batchchunker_spark.operators.advanced import (
        q53_null_aware_anti_shuffle,
    )
    from dbix_batchchunker_spark.plans.explain import formatted_plan

    plan = formatted_plan(q53_null_aware_anti_shuffle(spark, SF_DIR))
    assert re.search(r"Join LeftAnti, \(probe_key", plan) or re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) LeftAnti", plan
    ), plan
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin\n", plan)
    assert len(nlj) <= 1, plan  # only the 1-row stats cross join


def test_compensating_chunk_overwrite_protocol(spark, tmp_path):
    """The stage->promote->commit protocol (reference single_rows txn
    analog, BatchChunker.pm:1305-1327): fresh commit replaces exactly the
    chunk's buckets; replay of a committed chunk is an observable no-op;
    a torn run (staging without marker) is listed as compensation residue
    and heals by roll-forward re-run; hidden dirs never leak into reads."""
    import os

    from dbix_batchchunker_spark.sources.parquet import (
        committed_chunks,
        compensating_chunk_overwrite,
        read_committed,
        uncommitted_residue,
    )

    path = str(tmp_path / "tbl")
    base = spark.range(0, 30).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    assert compensating_chunk_overwrite(
        base, path, "0-29", "id", bucket_width=10) == "committed"
    assert committed_chunks(path) == {"0-29"}
    assert uncommitted_residue(path) == []

    # chunk rewrite of ids 10..19 only
    patch = spark.range(10, 20).select(F.col("id"), (F.col("id") * 100).alias("v"))
    assert compensating_chunk_overwrite(
        patch, path, "10-19", "id", bucket_width=10) == "committed"
    got = {r.id: r.v for r in read_committed(spark, path).collect()}
    assert got == {i: (i * 100 if 10 <= i < 20 else i * 2) for i in range(30)}

    # replay of a committed chunk: no-op, marker decides — and it sweeps
    # residue from a crash BETWEEN marker write and staging cleanup
    crashed = str(tmp_path / "tbl" / "_staging" / "chunk=10-19")
    os.makedirs(crashed, exist_ok=True)
    assert compensating_chunk_overwrite(
        patch, path, "10-19", "id", bucket_width=10) == "already-committed"
    assert not os.path.exists(crashed)

    # torn run: staging exists, no marker -> residue; re-run heals it
    stale = str(tmp_path / "tbl" / "_staging" / "chunk=20-29")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-torn.parquet"), "wb") as fh:
        fh.write(b"torn")
    assert uncommitted_residue(path) == ["20-29"]
    repair = spark.range(20, 30).select(F.col("id"), (F.col("id") * 7).alias("v"))
    assert compensating_chunk_overwrite(
        repair, path, "20-29", "id", bucket_width=10) == "committed"
    assert uncommitted_residue(path) == []
    got = {r.id: r.v for r in read_committed(spark, path).collect()}
    assert got == {
        i: (i * 7 if i >= 20 else i * 100 if i >= 10 else i * 2)
        for i in range(30)
    }


def test_compensating_overwrite_clears_emptied_buckets(spark, tmp_path):
    """Round-9 advisor (medium): a delete-heavy chunk whose range covers a
    bucket with ZERO surviving rows stages no dir for it — the promote
    must CLEAR that live bucket, or stale rows outlive the committed
    delete. With id_range the covering buckets are derivable, so the
    clear is part of the commit and recorded in the marker."""
    import json
    import os

    from dbix_batchchunker_spark.sources.parquet import (
        compensating_chunk_overwrite,
        read_committed,
    )

    path = str(tmp_path / "tbl")
    base = spark.range(0, 30).select(F.col("id"), (F.col("id") * 2).alias("v"))
    compensating_chunk_overwrite(
        base, path, "0-29", "id", bucket_width=10, id_range=(0, 29)
    )

    # re-commit chunk 10-19 with ALL its rows deleted (advisor's repro)
    emptied = base.where((F.col("id") >= 10) & (F.col("id") < 20)).where(
        F.lit(False)
    )
    assert compensating_chunk_overwrite(
        emptied, path, "10-19", "id", bucket_width=10, id_range=(10, 19)
    ) == "committed"
    got = sorted(r.id for r in read_committed(spark, path).collect())
    assert got == list(range(0, 10)) + list(range(20, 30))
    marker = json.load(
        open(os.path.join(path, "_commits", "chunk-10-19.json"))
    )
    assert marker["cleared"] == ["__bucket=1"]
    assert marker["buckets"] == []

    # mixed chunk: bucket 2 emptied, bucket 0 partially survives; bucket 1
    # is ALREADY absent (cleared above) so only bucket 2 is removed now —
    # "cleared" records dirs actually deleted, keeping replay idempotent
    survivors = base.where(F.col("id") < 5)
    assert compensating_chunk_overwrite(
        survivors, path, "0-29b", "id", bucket_width=10, id_range=(0, 29)
    ) == "committed"
    got = sorted(r.id for r in read_committed(spark, path).collect())
    assert got == list(range(0, 5))
    marker = json.load(
        open(os.path.join(path, "_commits", "chunk-0-29b.json"))
    )
    assert marker["cleared"] == ["__bucket=2"]


def test_read_committed_range_prunes_buckets(spark, tmp_path):
    """The derived __bucket predicate must reach the scan as a
    PartitionFilter (pruned at planning time), with the id BETWEEN pushed
    into the surviving row groups — the O(chunk) read contract on the
    compensating-commit layout."""
    from dbix_batchchunker_spark.plans.explain import formatted_plan
    from dbix_batchchunker_spark.sources.parquet import (
        compensating_chunk_overwrite,
        read_committed_range,
    )

    path = str(tmp_path / "tbl")
    base = spark.range(0, 100).select(F.col("id"), (F.col("id") * 3).alias("v"))
    compensating_chunk_overwrite(base, path, "all", "id", bucket_width=10)

    out = read_committed_range(spark, path, "id", 42, 58, bucket_width=10)
    got = sorted(r.id for r in out.collect())
    assert got == list(range(42, 59))

    plan = formatted_plan(out)
    assert "PartitionFilters" in plan
    # the bucket range 4..5 appears in the partition filters line
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "__bucket" in pf_line
    # and the data predicate pushes down
    assert "PushedFilters" in plan


def test_compensating_overwrite_rejects_misaligned_chunks(spark, tmp_path):
    """Round-9 review: a chunk covering PART of a bucket replaces the
    whole bucket with partial data (measured: an example lost 60% of its
    rows). id_range makes the alignment invariant enforceable."""
    import pytest as _pytest

    from dbix_batchchunker_spark.sources.parquet import (
        compensating_chunk_overwrite,
    )

    df = spark.range(0, 30).select(F.col("id"), F.col("id").alias("v"))
    path = str(tmp_path / "tbl")
    with _pytest.raises(ValueError, match="not bucket-aligned"):
        compensating_chunk_overwrite(
            df, path, "5-14", "id", bucket_width=10, id_range=(5, 14)
        )
    with _pytest.raises(ValueError, match="not bucket-aligned"):
        compensating_chunk_overwrite(
            df, path, "0-14", "id", bucket_width=10, id_range=(0, 14)
        )
    with _pytest.raises(ValueError, match="below min_id"):
        compensating_chunk_overwrite(
            df, path, "x", "id", bucket_width=10, min_id=5, id_range=(0, 9)
        )
    # aligned, and tail-partial with is_tail, both pass
    assert compensating_chunk_overwrite(
        df, path, "0-9", "id", bucket_width=10, id_range=(0, 9)
    ) == "committed"
    assert compensating_chunk_overwrite(
        df.where(F.col("id") >= 10), path, "10-24", "id",
        bucket_width=10, id_range=(10, 24), is_tail=True,
    ) == "committed"


def test_embedding_store_delete_shuffle_fallback(spark, monkeypatch):
    """Round-14 verdict #3, similarity half: compact_embedding_store's
    anti-joins broadcast the purge list below DELETE_BROADCAST_MAX_IDS
    and must degrade to SHUFFLE_HASH joins past it — a mass takedown
    costs one extra shuffle per store half, never a driver OOM — with
    identical survivors through either plan."""
    from dbix_batchchunker_spark.operators import similarity as sim_mod
    from dbix_batchchunker_spark.operators.similarity import (
        compact_embedding_store,
    )

    entries = spark.range(0, 200).select(
        F.col("id").alias("vec_id"), (F.col("id") % 7).alias("centroid_id")
    )
    vectors = spark.range(0, 200).select(
        F.col("id").alias("vec_id"), (F.col("id") % 3).alias("label")
    )
    deleted = spark.range(0, 200, 5).select(F.col("id").alias("vec_id"))

    def _plan(df):
        df.write.format("noop").mode("overwrite").save()
        return df._jdf.queryExecution().executedPlan().toString()

    e1, v1 = compact_embedding_store(entries, vectors, deleted)
    keep_e = sorted(r.vec_id for r in e1.collect())  # bounded: 160 rows
    keep_v = sorted(r.vec_id for r in v1.collect())  # bounded: 160 rows
    assert "BroadcastHashJoin" in _plan(e1) and "LeftAnti" in _plan(e1)

    monkeypatch.setattr(sim_mod, "DELETE_BROADCAST_MAX_IDS", 1)
    e2, v2 = compact_embedding_store(entries, vectors, deleted)
    for half in (e2, v2):
        plan = _plan(half)
        assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan
    assert sorted(r.vec_id for r in e2.collect()) == keep_e  # bounded
    assert sorted(r.vec_id for r in v2.collect()) == keep_v  # bounded

    # caller-supplied size hint (round-15 advisor): skips the size probe
    # entirely and picks the plan from the hint — same survivors
    e3, v3 = compact_embedding_store(entries, vectors, deleted, n_deleted=40)
    assert "ShuffledHashJoin" in _plan(e3)  # 40 > patched ceiling of 1
    assert sorted(r.vec_id for r in e3.collect()) == keep_e  # bounded
    monkeypatch.setattr(sim_mod, "DELETE_BROADCAST_MAX_IDS", 2_000_000)
    e4, _ = compact_embedding_store(entries, vectors, deleted, n_deleted=40)
    assert "BroadcastHashJoin" in _plan(e4)
    assert sorted(r.vec_id for r in e4.collect()) == keep_e  # bounded
