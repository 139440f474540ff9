"""Bin-bucketed interval-overlap join (round 8).

Property-checked against the naive inequality join on random interval
sets, including nested intervals, touching endpoints, and intervals
spanning many bins — plus a plan assertion that the bucketed path is an
equi-join, not a nested-loop cross product.
"""

from __future__ import annotations

import random

from dfx_indicators_etl_spark.operators.intervals import interval_overlap_join


def _naive(A, B):
    return {
        (i, j)
        for i, (sa, ea) in A
        for j, (sb, eb) in B
        if sa <= eb and sb <= ea
    }


def _mk(spark, rows):
    data = [(i, s, e) for i, (s, e) in rows]
    return spark.createDataFrame(data, "id long, start long, end long")


def test_matches_naive_join_random(spark):
    """Random intervals of wildly mixed lengths: bucketed pairs ==
    naive inequality-join pairs, each pair exactly once."""
    rng = random.Random(8)

    def intervals(n, id0):
        out = []
        for i in range(n):
            start = rng.randrange(0, 5000)
            out.append((id0 + i, (start, start + rng.randrange(0, 900))))
        return out

    A, B = intervals(120, 0), intervals(120, 1000)
    got = interval_overlap_join(_mk(spark, A), _mk(spark, B), bin_width=100)
    pairs = [(r["id_a"], r["id_b"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs)), "pair emitted more than once"
    assert set(pairs) == _naive(A, B)


def test_edges_touching_nested_disjoint(spark):
    """Touching endpoints count (closed intervals); nesting counts;
    disjoint does not; an interval spanning many bins still emits its
    pairs exactly once."""
    A = [(1, (100, 200)), (2, (0, 10_000)), (3, (500, 500))]
    B = [(10, (200, 300)), (11, (99, 100)), (12, (201, 499)), (13, (9_999, 20_000))]
    got = interval_overlap_join(
        _mk(spark, A), _mk(spark, B), bin_width=64
    ).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in got)
    assert pairs == sorted(_naive(A, B))
    assert (1, 10) in pairs and (1, 11) in pairs  # touching both ends
    assert (3, 12) not in pairs  # disjoint
    assert len(pairs) == len(set(pairs))


def test_plan_is_equi_join(spark):
    """The physical plan joins on the bin id — no nested-loop or
    cartesian node anywhere (that's the operator's entire point)."""
    A = _mk(spark, [(1, (0, 10))])
    B = _mk(spark, [(2, (5, 15))])
    plan = (
        interval_overlap_join(A, B, bin_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
