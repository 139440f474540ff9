"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (on in `session.get_spark`) handles most
runtime skew; these are the *explicit* tools for the cases AQE can't
see — a groupBy whose hot key overwhelms one reducer, or a repeated
join against a dimension with a known-hot key. Both are semantically
transparent: results are identical to the unsalted plan (asserted in
tests and by the oracle-checked ``q_skew_salted_agg``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "salted_agg",
    "salted_join",
    "global_ntile",
    "global_running_sum",
    "histogram_percentiles",
    "REAGG",
]

# How each partial aggregate re-aggregates in phase 2.
REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output name → (function, column) with function in
    ``REAGG``. Phase 1 aggregates on (keys, salt) — the hot key spreads
    over ``salt_buckets`` reducers — phase 2 re-aggregates the (small)
    partials on the true keys. The salt must NOT be a function of the
    group key (that would leave the hot key on one reducer): pass a
    high-cardinality column as ``salt_on``, or default to a per-row
    id (salt assignment then varies across retries, but every salt
    assignment yields the same final result). Only decomposable
    aggregates belong here; AVG = SUM/COUNT built from two entries.
    """
    unsupported = {f for f, _ in aggs.values()} - set(REAGG)
    if unsupported:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unsupported)}")
    if salt_on is None:
        salt_src = F.monotonically_increasing_id()
    else:
        salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, func)(col).alias(f"__p_{name}")
            for name, (func, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            REAGG[func](f"__p_{name}").alias(name)
            for name, (func, _col) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Skew-proof fact⋈dim shuffle join: replicate the dim per salt.

    For a shuffle join whose fact side has hot keys, each dim row
    replicates ``salt_buckets`` times and each fact row takes a salt
    *independent of the join key* (a high-cardinality ``salt_on``
    column, default a per-row id), so one hot key spreads over
    ``salt_buckets`` tasks at the cost of a ``salt_buckets``× larger
    dim shuffle side. (A dim under the broadcast threshold doesn't
    need this — broadcast joins are skew-immune.)
    """
    salts = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long"))
    )
    dim_rep = dim.withColumn("__salt", salts)
    if salt_on is None:
        salt_src = F.monotonically_increasing_id()
    else:
        salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets))
    )
    return fact_salted.join(dim_rep, [key, "__salt"], how).drop("__salt")


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: Sequence[Column],
    out_col: str,
    n_rows: int | None = None,
    small_rows_threshold: int = 8_000_000,
) -> DataFrame:
    """Globally-ordered ``ntile`` without a single-task global sort —
    the scale twin of ``F.ntile().over(Window.orderBy(...))``.

    An unpartitioned window funnels the whole frame through ONE task
    (``Exchange SinglePartition``); fine for a dimension-sized frame,
    an executor-killer at 10⁸–10⁹ rows. Above ``small_rows_threshold``
    this swaps to the two-phase rank shape (same pattern as
    ``text.pack_spans``): range-repartition on the TOTAL order (the
    caller must include a tie-break column), ``row_number`` within
    each range partition, add per-partition offsets collected as a
    ≤-#partitions-row control-plane map, then map the exact global
    rank through ntile's own fill rule — the first ``n mod k`` tiles
    take ``⌈n/k⌉`` rows, the rest ``⌊n/k⌋``. Bit-identical labels to
    the window ntile for ANY input (both are pure functions of the
    global rank), so the SQL oracle reproduces it.

    ``order_by`` must totally order the frame or labels are undefined.
    ``n_rows`` (if the caller already counted) skips the probe count.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_rows is None:
        n_rows = df.count()
    if n_rows <= small_rows_threshold:
        w = Window.orderBy(*order_by)
        return df.withColumn(out_col, F.ntile(n_tiles).over(w))
    n_parts = max(1, spark.sparkContext.defaultParallelism)
    parted = df.repartitionByRange(n_parts, *order_by).localCheckpoint(
        eager=False
    )
    keyed = parted.withColumn("__gnt_pid", F.spark_partition_id())
    counts = sorted(
        (r["__gnt_pid"], r["c"])
        for r in keyed.groupBy("__gnt_pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    offsets, running = {}, 0
    for pid, c in counts:
        offsets[pid] = running
        running += int(c)
    offset_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
            ),
            F.col("__gnt_pid"),
        ).cast("bigint")
        if offsets
        else F.lit(0).cast("bigint")
    )
    w = Window.partitionBy("__gnt_pid").orderBy(*order_by)
    rank = F.row_number().over(w) + offset_expr  # exact global 1-based rank
    # ntile fill rule: big tiles (⌈n/k⌉ rows) come first
    size_small = n_rows // n_tiles
    rem = n_rows % n_tiles
    boundary = (size_small + 1) * rem  # ranks in big tiles
    tile = F.when(
        F.lit(rem > 0) & (rank <= F.lit(boundary)),
        F.ceil(rank / F.lit(size_small + 1)),
    ).otherwise(
        # size_small == 0 ⇒ n < k ⇒ every rank lands in the big-tile
        # branch above; this division is never evaluated with 0
        F.lit(rem)
        + F.ceil((rank - F.lit(boundary)) / F.lit(max(size_small, 1)))
    )
    return keyed.withColumn(out_col, tile.cast("int")).drop("__gnt_pid")


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[Column],
    out_col: str,
    total_col: str | None = None,
    n_rows: int | None = None,
    small_rows_threshold: int = 8_000_000,
) -> DataFrame:
    """Globally-ordered exact running sum without a single-task global
    sort — the scale twin of
    ``F.sum(v).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))``.

    An unpartitioned running-sum window funnels the whole frame through
    ONE task (``Exchange SinglePartition``); fine for a
    dimension-sized frame, an executor-killer at 10⁸–10⁹ rows. Above
    ``small_rows_threshold`` this swaps to the two-phase shape shared
    with ``global_ntile``: range-repartition on the TOTAL order (the
    caller must include a tie-break column), a PER-PARTITION running
    sum window, and per-partition offsets — each range partition's
    total, collected as a ≤-#partitions-row control-plane list and
    prefix-summed on the driver. Decimal partials add exactly on both
    sides of the split (the driver prefix-sums ``decimal.Decimal``
    values), so the result is value-identical to the window plan for
    any partitioning.

    ``order_by`` must totally order the frame, and ``value_col`` must
    be non-null (window semantics for NULL prefixes — a running NULL
    until the first non-null value — are not reproduced by the offset
    arithmetic). ``total_col``, if given, attaches the grand total to
    every row (small path: an unbounded window over the same
    single-task frame; large path: a driver-side literal — the sum of
    the already-collected partition totals, one more exact decimal
    fold, no extra job).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_rows is None:
        n_rows = df.count()
    if n_rows <= small_rows_threshold:
        w = Window.orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = df.withColumn(out_col, F.sum(value_col).over(w))
        if total_col is not None:
            w_all = Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            out = out.withColumn(total_col, F.sum(value_col).over(w_all))
        return out
    sum_type = df.select(F.sum(value_col)).schema[0].dataType
    n_parts = max(1, spark.sparkContext.defaultParallelism)
    parted = df.repartitionByRange(n_parts, *order_by).localCheckpoint(
        eager=False
    )
    keyed = parted.withColumn("__grs_pid", F.spark_partition_id())
    partials = sorted(
        (r["__grs_pid"], r["s"])
        for r in keyed.groupBy("__grs_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets, running = {}, 0  # exact: int or decimal.Decimal arithmetic
    for pid, s in partials:
        offsets[pid] = running
        running += s if s is not None else 0
    offset_expr = (
        F.element_at(
            F.create_map(
                *[
                    x
                    for pid, off in offsets.items()
                    for x in (F.lit(pid), F.lit(off).cast(sum_type))
                ]
            ),
            F.col("__grs_pid"),
        )
        if offsets
        else F.lit(0).cast(sum_type)
    )
    w = (
        Window.partitionBy("__grs_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = keyed.withColumn(
        out_col, (F.sum(value_col).over(w) + offset_expr).cast(sum_type)
    ).drop("__grs_pid")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(running).cast(sum_type))
    return out


def histogram_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: dict[str, float],
) -> DataFrame:
    """EXACT per-group interpolated percentiles without buffering any
    group's values in aggregation state — the giant-group-safe twin of
    ``F.percentile``.

    ``F.percentile`` keeps a value→count map per group in its agg
    buffer, so a 100 TB fact with a handful of groups concentrates a
    near-corpus-cardinality map in ONE task's memory. This operator
    distributes that histogram instead: reduce to ``(group, value) →
    count`` (one shuffle, map-side combinable), cumulative-count window
    per group over DISTINCT values only, pick the two rows straddling
    each target rank, and interpolate with ``F.percentile``'s own
    arithmetic — ``position = p·(n−1)``;
    ``(⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi`` on doubles — so the result is
    bit-identical to the exact aggregate for any input. State per task
    is O(1); the widest shuffle is distinct-value-sized, and for
    bounded-domain measures (prices at 2 decimal places, ages, scores)
    that is orders of magnitude below row count.

    ``probs`` maps output column name → percentile in [0, 1]. Returns
    one row per group: ``group_cols`` + one DOUBLE column per entry.
    """
    from pyspark.sql import Window

    groups = list(group_cols)
    v_dbl = F.col(value_col).cast("double")
    hist = df.groupBy(*groups, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    totals = hist.groupBy(*groups).agg(F.sum("__c").alias("__n"))
    w = (
        Window.partitionBy(*groups)
        .orderBy(v_dbl.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(w)).join(
        F.broadcast(totals), groups
    )
    # row covers 0-based ranks [__cum - __c, __cum - 1]
    lo_rank = F.col("__cum") - F.col("__c")
    aggs = []
    for name, p in probs.items():
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        lower = F.floor(pos)
        higher = F.ceil(pos)
        covers_lower = (lo_rank <= lower) & (lower < F.col("__cum"))
        covers_higher = (lo_rank <= higher) & (higher < F.col("__cum"))
        lo_val = F.max(F.when(covers_lower, v_dbl))
        hi_val = F.max(F.when(covers_higher, v_dbl))
        pos_a = F.max(F.when(covers_lower, pos))  # pos is group-constant
        low_a = F.max(F.when(covers_lower, lower)).cast("double")
        hig_a = F.max(F.when(covers_lower, higher)).cast("double")
        aggs.append(
            F.when(low_a == hig_a, lo_val)
            .otherwise((hig_a - pos_a) * lo_val + (pos_a - low_a) * hi_val)
            .alias(name)
        )
    return cum.groupBy(*groups).agg(*aggs)
