"""Iterative graph operators (PageRank) on DataFrames.

The reference engine has no graph surface; this extends the repo's
iterative scaffolding (``operators.dedup.connected_components``) to
rank propagation — the canonical "iterative algorithm on Spark"
pattern a training-data pipeline needs for link/citation-weighted
corpus scoring.

Scale design: the edge table is normalized to per-source transition
fractions ONCE, repartitioned by source and checkpointed — each
iteration then shuffles only the |V|-sized rank table (join on src +
re-aggregate on dst), never the |E|-sized edge table. Dangling-node
mass (nodes with no out-edges) stays in the plan as a 1-row aggregate
broadcast-cross-joined onto the update — no per-round driver action.
Lineage is truncated every other round with an eager localCheckpoint
so iterations don't build an unboundedly deep plan while halving the
per-round materialization jobs.

Determinism contract (for the DuckDB oracle): pass ``weight`` as a
DECIMAL column so the per-edge and per-source sums are exact; all
per-iteration arithmetic is IEEE double with the same operation order
the unrolled-CTE oracle uses, and callers round the final rank (the
only remaining divergence is summation order inside one aggregate —
last-ulp, absorbed by ``round(pr, 6)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_hops", "cheapest_path_hops", "pagerank"]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over ``edges`` for every node in ``nodes``.

    ``edges`` holds one row per (src, dst) with a summed weight;
    ``nodes`` holds one ``node`` column covering every vertex (isolated
    and dangling vertices included — they receive teleport mass and
    redistribute their rank uniformly). Returns ``(node, pr)`` with the
    un-rounded double rank; ranks sum to 1.

    Update rule (matching the unrolled SQL oracle term-for-term)::

        pr'(v) = (1-d)/N + d * (sum_in(pr(u) * w(u,v)/out_w(u))
                                + dangling_mass/N)
    """
    teleport = 1.0 - damping

    nodes = nodes.select("node").localCheckpoint(eager=True)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty node set")

    # Transition fractions, computed once. The weight column stays in
    # its input type (decimal in the oracle-checked path) until the
    # single double division, so per-source totals are exact.
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__total_w"))
    frac = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            (F.col(weight).cast("double") / F.col("__total_w").cast("double")).alias(
                "frac"
            ),
        )
        # Partitioned by src so every iteration's rank join co-locates
        # against a materialized edge side — the big table shuffles
        # once, not once per round.
        .repartition("src")
        .localCheckpoint(eager=True)
    )

    # Dangling vertices (no out-edges) redistribute their mass
    # uniformly each round. Detected once up front.
    dangling = nodes.join(
        frac.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint(eager=True)
    has_dangling = bool(dangling.limit(1).count())

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr")).localCheckpoint(
        eager=True
    )

    # Loop-overhead design: the dangling-mass scalar stays IN the plan
    # (a 1-row aggregate broadcast-cross-joined onto the update) rather
    # than round-tripping through the driver, and lineage is truncated
    # every OTHER round — a 2-round-deep plan is harmless, and halving
    # the eager materializations halves the per-round job count. Both
    # changes cut scheduling overhead only; the arithmetic and its IEEE
    # operation order are unchanged (the oracle contract).
    for i in range(n_iter):
        if has_dangling:
            dm_row = (
                ranks.join(dangling, "node", "left_semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dm"))
            )
            dm_term = F.col("__dm") / F.lit(float(n_nodes))
        else:
            dm_row = None
            dm_term = F.lit(0.0)
        base = nodes if dm_row is None else nodes.crossJoin(F.broadcast(dm_row))
        contrib = (
            frac.join(ranks, frac["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("frac")).alias("__mass"))
        )
        ranks = base.join(contrib, base["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(teleport / n_nodes)
                + F.lit(damping)
                * (F.coalesce(F.col("__mass"), F.lit(0.0)) + dm_term)
            ).alias("pr"),
        )
        # Lineage truncation is only needed when the plan would
        # otherwise grow EXPONENTIALLY: with dangling nodes, `ranks`
        # is referenced twice per round (dangling-mass aggregate +
        # contribution join), doubling the un-checkpointed subtree
        # each round. Without dangling nodes (every vertex has an
        # out-edge — true for the trade graph at sf≥0.01), each round
        # references `ranks` exactly once, the plan grows LINEARLY,
        # and the whole n_iter-round recurrence can run as ONE job at
        # the final collect instead of n_iter/2 checkpoint
        # materializations (r15, guide §1.2/§5 — localCheckpoint is
        # for lineage control, not a per-round obligation; arithmetic
        # and its IEEE operation order are unchanged).
        if has_dangling and (i % 2 == 1 or i == n_iter - 1):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS distances up to ``max_hops``: the minimum hop
    count from ANY source to each reachable node — the k-hop
    reachability primitive (influence radius, crawl frontier, link
    neighborhoods) the rank/triangle operators don't cover.

    Frontier iteration: each round joins only the CURRENT frontier
    (≤ |V| rows) against the edge table — never paths — so work per
    round is one |frontier|-keyed shuffle join; nodes already
    discovered are anti-joined away, which both deduplicates and makes
    first-discovery = minimum hops by construction. The frontier is
    eagerly checkpointed per round (truncates lineage; a BFS plan
    would otherwise deepen exponentially) and the loop exits early on
    an empty frontier, so dense graphs (everything within 2 hops)
    never pay for the full ``max_hops``. Emits ``(node, hops)``;
    nodes beyond ``max_hops`` are absent — the SAME bound the
    oracle's recursive CTE applies, which is what keeps a cyclic
    dense graph's path enumeration finite on the SQL side.
    """
    dist = (
        sources.select("node")
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for k in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(F.col(dst).alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(k).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def cheapest_path_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    cost: str = "w",
) -> DataFrame:
    """Bounded-hop multi-source cheapest path — ``max_hops`` rounds of
    Bellman–Ford relaxation: after round k, ``cost(v)`` is the exact
    minimum total edge cost over paths of ≤ k edges from any source.
    The weighted twin of ``bfs_hops`` (route cost, not hop count);
    the hop bound is what makes the problem finite on cyclic graphs
    and is shared verbatim by the recursive-CTE oracle.

    Costs must be non-negative integers (exact min/sum on both
    engines — derive them from DECIMAL measures scaled to integers).
    Each round joins the FULL |V|-sized distance table against the
    edge table (one keyed shuffle join; Bellman–Ford's relax-all
    round, which is what matches the ≤-k-edges semantics), re-takes
    the per-node min, checkpoints, and exits early when no cost
    improved. Emits ``(node, cost)``; nodes unreachable within
    ``max_hops`` are absent.
    """
    dist = (
        sources.select("node")
        .distinct()
        .withColumn("cost", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_hops):
        cand = dist.join(edges, dist["node"] == edges[src]).select(
            F.col(dst).alias("node"),
            (F.col("cost") + F.col(cost).cast("bigint")).alias("cost"),
        )
        new_dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
        improved = new_dist.join(
            dist.withColumnRenamed("cost", "__old"), "node", "left"
        ).filter(
            F.col("__old").isNull() | (F.col("cost") < F.col("__old"))
        )
        if improved.isEmpty():
            break
        dist = new_dist
    return dist
