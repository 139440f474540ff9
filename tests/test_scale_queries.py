"""Scan/shuffle-reduction levers: DPP, Bloom prefilter, Z-order.

Each test pins the *mechanism* (pruning expression, filter
selectivity, footer min-max skipping), not just the result — the
oracle gate already pins results."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators.scale import (
    bloom_prefilter,
    bloom_words,
    zorder_scaled,
    zorder_value,
)
from dfx_indicators_etl_spark.plans import QUERIES
from dfx_indicators_etl_spark.plans.streaming_queries import _scratch
from dfx_indicators_etl_spark.sources import read_table


def test_dpp_prune_matches_direct_join(spark, sf_dir):
    """The partitioned+DPP path equals the same join computed directly
    over the raw table (the query itself asserts the dynamicpruning
    expression; a failed assertion surfaces here as the raised error)."""
    out = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in QUERIES["q_dpp_prune"](spark, sf_dir).collect()
    }
    e = read_table(spark, sf_dir, "events")
    dim = (
        e.select(
            F.col("ts").cast("date").alias("day"),
            F.date_trunc("week", "ts").cast("date").alias("wk"),
        )
        .distinct()
        .filter(F.col("wk") == F.lit("2024-01-08").cast("date"))
        .select("day")
    )
    direct = {
        r["event_type"]: (r["n"], float(r["s"]))
        for r in e.withColumn("day", F.col("ts").cast("date"))
        .join(dim, "day")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert out == direct


def test_bloom_prefilter_selectivity_and_no_false_negatives(spark, sf_dir):
    """The Bloom prefilter keeps every true match (zero false
    negatives) and passes only a small fraction of the fact — the
    property that makes it worth broadcasting at 100 TB."""
    orders = read_table(spark, sf_dir, "orders")
    sel = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    ).select("o_orderkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    bloom = bloom_words(sel, "o_orderkey")
    kept = bloom_prefilter(li, bloom, "l_orderkey")

    n_fact = li.count()
    n_kept = kept.count()
    n_true = li.join(
        sel, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    ).count()
    n_kept_true = kept.join(
        sel, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    ).count()
    assert n_kept_true == n_true  # no false negatives, ever
    assert n_kept >= n_true
    # m=2^17 bits vs ~100 keys -> fp rate ~0; generous bound anyway
    assert n_kept <= max(2 * n_true, n_true + 0.01 * n_fact)
    assert n_kept < 0.1 * n_fact  # the filter actually filters


def test_bloom_word_table_is_bounded(spark):
    """The word table never exceeds n_bits/64 rows no matter how many
    keys go in — that bound is what keeps it broadcastable."""
    keys = spark.range(50_000).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k", n_bits=1 << 12)
    assert words.count() <= (1 << 12) // 64


def _suppkey_candidate_files(path: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose suppkey min-max intersects [lo, hi], total files)
    straight from parquet footers — what any stats-aware reader
    prunes on."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    cand = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == "l_suppkey" and col.statistics:
                    s = col.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            cand += 1
    return cand, len(files)


def test_zorder_layout_skips_files_where_1d_sort_cannot(spark, sf_dir):
    """Footer-stats data skipping: under a Z-order layout a filter on
    the SECOND dimension prunes files; under a 1-D l_partkey sort it
    cannot (every file spans the full suppkey range)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    sk_max = li.agg(F.max("l_suppkey")).collect()[0][0]
    lo, hi = int(0.2 * sk_max), int(0.35 * sk_max)  # ~15% suppkey band
    root = _scratch("dfx_ztest_")
    try:
        (
            zorder_scaled(li, "l_partkey", "l_suppkey")
            .repartitionByRange(16, F.col("z"))
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite")
            .parquet(f"{root}/zorder")
        )
        (
            li.repartitionByRange(16, F.col("l_partkey"))
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(f"{root}/linear")
        )
        z_cand, z_total = _suppkey_candidate_files(f"{root}/zorder", lo, hi)
        l_cand, l_total = _suppkey_candidate_files(f"{root}/linear", lo, hi)
        assert z_total >= 8 and l_total >= 8
        assert l_cand == l_total  # 1-D partkey sort: no suppkey skipping
        assert z_cand < z_total  # z-order: real skipping on dim 2
        assert z_cand < l_cand
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_zorder_value_interleave_exact(spark):
    df = spark.createDataFrame(
        [(3, 5), (0, 0), (65535, 65535), (1, 0), (0, 1)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(zorder_value("a", "b").alias("z")).collect()
    ]
    assert got == [0b100111, 0, (1 << 32) - 1, 1, 2]
