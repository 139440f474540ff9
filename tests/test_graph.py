"""PageRank operator tests: numpy power-iteration reference on
hand-built graphs (including dangling nodes), invariants, and the
registered nation-trade query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators.graph import pagerank
from dfx_indicators_etl_spark.plans import QUERIES


def _numpy_pagerank(n, edges, n_iter=10, damping=0.85):
    """Reference power iteration. ``edges``: [(src, dst, w), ...]."""
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[s] += w
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = sum(pr[v] for v in range(n) if out_w[v] == 0)
        nxt = np.full(n, (1.0 - damping) / n)
        for v in range(n):
            nxt[v] += damping * dangling / n
        for s, d, w in edges:
            nxt[d] += damping * pr[s] * w / out_w[s]
        pr = nxt
    return pr


def _run(spark, n, edges, **kw):
    edges_df = spark.createDataFrame(edges, "src int, dst int, w double")
    nodes_df = spark.range(n).select(F.col("id").cast("int").alias("node"))
    rows = pagerank(edges_df, nodes_df, **kw).collect()
    got = np.zeros(n)
    for r in rows:
        got[r["node"]] = r["pr"]
    return got


def test_pagerank_matches_numpy_star(spark):
    # Star: everyone points at node 0, node 0 points back at 1.
    edges = [(i, 0, 1.0) for i in range(1, 5)] + [(0, 1, 1.0)]
    got = _run(spark, 5, edges)
    want = _numpy_pagerank(5, edges)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # The 0↔1 cycle holds nearly all the mass; leaves keep ~teleport.
    assert min(got[0], got[1]) > 10 * max(got[2:])


def test_pagerank_weighted_edges(spark):
    # Node 0 splits 3:1 between 1 and 2 — weight must matter.
    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)]
    got = _run(spark, 3, edges)
    want = _numpy_pagerank(3, edges)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got[1] > got[2]


def test_pagerank_dangling_mass_conserved(spark):
    # Node 2 is dangling (no out-edges); node 3 is fully isolated.
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    got = _run(spark, 4, edges)
    want = _numpy_pagerank(4, edges)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # Ranks always sum to 1 when dangling mass is redistributed.
    assert got.sum() == pytest.approx(1.0, abs=1e-12)


def test_pagerank_empty_nodes_raises(spark):
    edges_df = spark.createDataFrame([], "src int, dst int, w double")
    nodes_df = spark.createDataFrame([], "node int")
    with pytest.raises(ValueError, match="empty node set"):
        pagerank(edges_df, nodes_df)


def test_nation_query_shape(spark, sf_dir):
    rows = QUERIES["q_pagerank_nations"](spark, sf_dir).collect()
    assert len(rows) == 25  # every nation ranked, dangling included
    total = sum(r["pagerank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)  # post-rounding drift only
    assert all(r["pagerank"] > 0 for r in rows)


def test_bfs_hops_hand_built(spark):
    """Chain + cycle + unreachable node: minimum hops from a
    multi-source set, the max_hops bound, and first-discovery
    semantics on a cycle."""
    from pyspark.sql import functions as F

    from dfx_indicators_etl_spark.operators.graph import bfs_hops

    # a -> b -> c -> d -> e (chain), c -> a (cycle), z isolated,
    # s2 -> d (second source shortcut)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "a"),
         ("s2", "d")],
        "src string, dst string",
    )
    sources = spark.createDataFrame([("a",), ("s2",)], "node string")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(edges, sources, max_hops=4).collect()
    }
    # d: min(3 via chain, 1 via s2) = 1; e via d = 2; cycle back to a
    # never re-labels the source (first discovery wins)
    assert got == {"a": 0, "s2": 0, "b": 1, "c": 2, "d": 1, "e": 2}
    # max_hops truncation: from a only, e is 4 hops away
    got_a = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            edges, spark.createDataFrame([("a",)], "node string"),
            max_hops=3,
        ).collect()
    }
    assert "e" not in got_a and got_a["d"] == 3
    # early exit: a single edge graph stops after round 1
    tiny = spark.createDataFrame([("x", "y")], "src string, dst string")
    got_t = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            tiny, spark.createDataFrame([("x",)], "node string"),
            max_hops=10,
        ).collect()
    }
    assert got_t == {"x": 0, "y": 1}


def test_cheapest_path_hops_hand_built(spark):
    """Cheaper-but-longer routes win within the hop bound; outside it
    the expensive direct edge stands; relaxation handles the diamond."""
    from dfx_indicators_etl_spark.operators.graph import cheapest_path_hops

    # a -(10)-> d direct; a -(1)-> b -(1)-> c -(1)-> d cheap detour;
    # diamond: a -(2)-> e, b -(1)-> e
    edges = spark.createDataFrame(
        [("a", "d", 10), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
         ("a", "e", 2), ("b", "e", 1)],
        "src string, dst string, w long",
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["cost"]
        for r in cheapest_path_hops(edges, src, max_hops=4).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 2}
    # with only 1 hop allowed, the expensive direct edge is the best d
    got1 = {
        r["node"]: r["cost"]
        for r in cheapest_path_hops(edges, src, max_hops=1).collect()
    }
    assert got1 == {"a": 0, "b": 1, "d": 10, "e": 2}
