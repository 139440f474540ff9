"""Scan- and shuffle-reduction levers, demonstrated end-to-end
(SURVEY §2.A continuation; §4 scale rules made executable).

At 100 TB the fastest bytes are the ones never read and the cheapest
shuffle the one never performed. This module registers the three
levers as oracle-checked queries, each asserting its plan property
inside the query the way ``sink_bucketed_join`` does:

- ``q_dpp_prune`` — dynamic partition pruning: a partitioned fact
  scan that reads ONLY the partitions a runtime dim filter selects
  (the executed plan is asserted to carry a dynamicpruning
  expression in the scan's partition filters).
- ``q_bloom_prefilter_join`` — an explicit, deterministic Bloom
  runtime row filter built from the selective join side and
  broadcast to the fact scan (``operators.scale.bloom_words``),
  dropping non-matching fact rows BEFORE any exchange; the exact
  join afterwards makes false positives harmless, so the oracle
  equality doubles as the no-false-negative proof.
- ``sink_zorder_layout`` — multi-dimensional clustering: the fact is
  written sorted by a Morton/Z-order key so parquet min-max ranges
  are tight in BOTH dimensions and a filter on EITHER prunes files
  (quantified in tests/test_scale_queries.py against a 1-D layout).

Reference anchor: the reference engine reads whole datasets per
pipeline run (src/dfx_etl/storage/_base.py loads full parquet files);
these are the levers that make the same queries viable when the
dataset no longer fits a single read.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scale import bloom_prefilter, bloom_words, zorder_scaled
from ..sources import read_table
from .numeric import dec
from .registry import query
from .streaming_queries import _scratch


@query(
    "q_dpp_prune",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        WHERE CAST(date_trunc('week', ts) AS DATE) = DATE '2024-01-08'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events JOIN dim ON CAST(ts AS DATE) = dim.day
    GROUP BY event_type
    """,
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a day-partitioned fact.

    The fact lands partitioned by day (the layout a 100 TB event
    store always has); the query joins it to a dim whose filter
    (week == 2024-01-08) is NOT statically pushable into the fact
    scan — the matching days are only known at runtime. Catalyst's
    DPP turns the broadcast dim into a runtime partition filter, so
    the scan reads ~7 of ~30 day directories instead of all of them:
    the executed plan is asserted to carry a ``dynamicpruning``
    expression. The oracle recomputes from the raw (unpartitioned)
    events table — equality proves the partitioned round trip and
    the pruned scan lose nothing.
    """
    root = _scratch("dfx_dpp_")
    try:
        events = read_table(spark, sf_dir, "events")
        fact = events.select(
            "event_id",
            "event_type",
            "value",
            F.col("ts").cast("date").alias("day"),
        )
        fact.write.mode("overwrite").partitionBy("day").parquet(
            f"{root}/events_by_day"
        )
        back = spark.read.parquet(f"{root}/events_by_day")
        dim = (
            events.select(
                F.col("ts").cast("date").alias("day"),
                F.date_trunc("week", "ts").cast("date").alias("wk"),
            )
            .distinct()
            .filter(F.col("wk") == F.lit("2024-01-08").cast("date"))
            .select("day")
        )
        out = (
            back.join(dim, "day")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(dec("value")).cast("double").alias("sum_value"),
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "dynamicpruning" not in plan.lower():
            raise AssertionError(
                "partitioned-fact join lost its dynamic partition "
                "pruning filter — the scan would read every partition"
            )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "q_bloom_prefilter_join",
    oracle="""
    WITH sel AS (
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1995-04-01'
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN sel ON l.l_orderkey = sel.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact join against a <1%-selective key set, with an explicit
    Bloom runtime row filter cutting the fact before any exchange.

    The ≤2048-row Bloom word table (``operators.scale.bloom_words``
    over the urgent-Q1-1995 order keys) broadcasts to the lineitem
    scan; each fact row takes 3 codegen md5-bit probes and survives
    only if all bits are set — so the rows entering the (shuffling)
    exact join are ~the true matches plus the Bloom's false-positive
    residue, never the whole fact. The exact join then removes false
    positives, which is why the oracle (a plain join) must match
    bit-for-bit: any false NEGATIVE would drop revenue and break the
    hash. Spark's own runtimeFilter does this when stats allow; this
    is the engine-controlled, engine-portable version.
    """
    orders = read_table(spark, sf_dir, "orders")
    sel = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    ).select("o_orderkey")
    # xxhash64 family: this query's oracle is the plain exact join —
    # the Bloom stage is result-transparent (no false negatives; false
    # positives die in the exact join), so the fast codegen hash
    # replaces 6 md5-of-string evaluations per fact row (r15, §4).
    bloom = bloom_words(sel, "o_orderkey", family="xxhash64")
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    prefiltered = bloom_prefilter(
        lineitem, bloom, "l_orderkey", family="xxhash64"
    )
    joined = prefiltered.join(
        sel, F.col("l_orderkey") == F.col("o_orderkey")
    )
    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


@query(
    "sink_zorder_layout",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(l_partkey) AS BIGINT) AS sum_partkey
    FROM lineitem
    WHERE l_partkey BETWEEN 500 AND 700
      AND l_suppkey BETWEEN 20 AND 35
    """,
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered layout round trip + rectangle query.

    lineitem is written sorted by the Morton interleave of
    min-max-normalized (l_partkey, l_suppkey)
    (``operators.scale.zorder_scaled`` — normalization keeps either
    dimension's bits interleaved at every level no matter how the key
    ranges differ; then range-repartition on z, sort-within-partitions,
    so both the file
    split AND the row-group order follow the space-filling curve),
    then a 2-D rectangle filter runs over the READ-BACK files. The
    oracle computes the same rectangle from raw lineitem — equality
    proves the layout loses nothing; the data-skipping win (filters
    on either dimension touch a fraction of the files, vs a 1-D
    sorted layout) is quantified in tests/test_scale_queries.py by
    counting distinct input files per layout.
    """
    root = _scratch("dfx_zorder_")
    try:
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_quantity"
        )
        # Materialize z before the range exchange: repartitionByRange
        # SAMPLES its key column in a separate job, which would re-run
        # the scan + maxes aggregate + interleave fold end-to-end —
        # measured 2× the write time at sf0.1 (§4 rule: checkpoint a
        # computed range-partition key).
        z = zorder_scaled(li, "l_partkey", "l_suppkey").localCheckpoint(
            eager=False
        )
        (
            z.repartitionByRange(16, F.col("z"))
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite")
            .parquet(f"{root}/lineitem_z")
        )
        back = spark.read.parquet(f"{root}/lineitem_z")
        rect = back.filter(
            F.col("l_partkey").between(500, 700)
            & F.col("l_suppkey").between(20, 35)
        )
        out = rect.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum("l_partkey").cast("bigint").alias("sum_partkey"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "q_kmv_set_ops",
    oracle="""
    WITH ka AS (
        SELECT DISTINCT CAST(concat('0x',
                substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % 4294967296 AS h
        FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
        ORDER BY h LIMIT 64
    ),
    kb AS (
        SELECT DISTINCT CAST(concat('0x',
                substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
               % 4294967296 AS h
        FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        ORDER BY h LIMIT 64
    ),
    pool AS (
        SELECT DISTINCT h FROM (
            SELECT h FROM ka UNION ALL SELECT h FROM kb
        ) ORDER BY h LIMIT 64
    ),
    common AS (SELECT h FROM ka INTERSECT SELECT h FROM kb),
    stats AS (
        SELECT COUNT(*) AS n_pool, MAX(h) AS h_k,
               (SELECT COUNT(*) FROM pool
                WHERE h IN (SELECT h FROM common)) AS n_matched
        FROM pool
    ),
    est AS (
        SELECT n_pool, h_k, n_matched,
               CASE WHEN n_pool >= 64
                    THEN (63 * 4294967296 * 1000000) // h_k
                    ELSE n_pool * 1000000 END AS est_union_micro
        FROM stats
    )
    SELECT CAST(64 AS INT) AS k,
           CAST(n_pool AS BIGINT) AS n_pool,
           CAST(h_k AS BIGINT) AS h_k,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(est_union_micro AS BIGINT) AS est_union_micro,
           CAST(n_matched * 1000000 // n_pool AS BIGINT)
               AS est_jaccard_micro,
           CAST((est_union_micro // n_pool) * n_matched AS BIGINT)
               AS est_intersection_micro
    FROM est
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct SET-OPERATION sketch (r14): estimate
    |A ∪ B|, |A ∩ B|, and Jaccard for two customer cohorts — the
    pre-1995 and 1995-onward order customers — from two 64-row hash
    sketches, never shuffling the raw key sets to one place. The set
    query the HLL family cannot answer without compounding
    inclusion-exclusion error; at 100 TB the sketches are the ONLY
    cross-partition traffic (fixed-width hash distinct + TakeOrdered
    per side).

    Portable md5 hash family + integer-exact fixed-point estimates
    (micro-units via floor DIV), so the whole derivation replays
    bit-identically in DuckDB — FULL value oracle, like
    q_cms_heavy_hitters and unlike the opaque-internals HLL keys.
    Accuracy vs exact distinct counts and sketch mergeability are
    pytest-gated (tests/test_round14_ops.py).
    """
    from ..operators.scale import kmv_set_ops

    orders = read_table(spark, sf_dir, "orders")
    cut = F.lit("1995-01-01").cast("timestamp")
    return kmv_set_ops(
        orders.filter(F.col("o_orderdate") < cut),
        orders.filter(F.col("o_orderdate") >= cut),
        "o_custkey",
        k=64,
    )
