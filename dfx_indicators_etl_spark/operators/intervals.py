"""Interval-overlap join: the no-equi-key join Spark doesn't have.

``a.start <= b.end AND b.start <= a.end`` with no equality column
gives Catalyst nothing to hash on — the physical plan degenerates to
``BroadcastNestedLoopJoin`` (or a cartesian product), which is O(n·m)
row comparisons regardless of how few pairs actually overlap. The
standard distributed fix (used by every spatial/temporal engine) is
**bin bucketing**: replicate each interval onto the fixed-width time
bins it spans, equi-join on the bin, re-check the exact predicate, and
de-duplicate by emitting each pair only from the one bin that contains
``greatest(a.start, b.start)`` — a bin both intervals provably span,
so no ``distinct`` is needed.

Cost: each interval is replicated ``len/bin_width + 1`` times (choose
``bin_width`` near the typical interval length to keep replication
~2×), the join is a plain shuffled equi-join on the bin id, and the
candidate set is only pairs sharing a bin — proportional to true
temporal density, never n·m. Hot bins (load spikes) are ordinary
equi-join skew, handled by AQE or ``operators.scale.salted_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bin_width: int,
    start_col: str = "start",
    end_col: str = "end",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (left, right) pairs whose closed integer intervals
    ``[start, end]`` overlap, via bin bucketing (module docstring).

    ``left`` / ``right`` carry integer ``start_col`` ≤ ``end_col``
    (epoch seconds, days — any unit) plus payload columns; every
    output column is suffixed per side. Overlap is closed on both
    ends (touching endpoints count; the caller filters
    ``overlap > 0`` for open semantics).
    """
    sa, sb = suffixes

    def binned(df: DataFrame, suffix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{c}{suffix}") for c in df.columns]
        )
        s = F.col(f"{start_col}{suffix}")
        e = F.col(f"{end_col}{suffix}")
        return renamed.select(
            "*",
            F.explode(
                F.sequence(F.floor(s / bin_width), F.floor(e / bin_width))
            ).alias("__bin"),
        )

    la, rb = binned(left, sa), binned(right, sb)
    s_a, e_a = F.col(f"{start_col}{sa}"), F.col(f"{end_col}{sa}")
    s_b, e_b = F.col(f"{start_col}{sb}"), F.col(f"{end_col}{sb}")
    anchor = F.greatest(s_a, s_b)
    return (
        la.join(rb, "__bin")
        .filter((s_a <= e_b) & (s_b <= e_a))
        # exactly one surviving bin per overlapping pair: both
        # intervals contain greatest(start_a, start_b), so both were
        # replicated onto its bin
        .filter(F.col("__bin") == F.floor(anchor / bin_width))
        .drop("__bin")
    )
