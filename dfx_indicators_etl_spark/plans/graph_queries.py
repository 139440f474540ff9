"""Graph queries: PageRank over the nation trade network.

An iterative algorithm with a full value-verified oracle: the fixed
iteration count lets the DuckDB side unroll power iteration into a
chain of CTEs (r0..rN), so the driver hash-compares an algorithm SQL
normally can't express — a stronger check than the rows-only fallback
other engines use for iterative ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources import read_tables
from .analytics import REVENUE_SQL, _revenue
from .registry import query

N_ITER = 10
DAMPING = 0.85


def _pagerank_oracle(n_iter: int = N_ITER, damping: float = DAMPING) -> str:
    """Unrolled power-iteration oracle.

    Arithmetic mirrors ``operators.graph.pagerank`` term-for-term:
    decimal-exact edge weights and per-source totals, one double
    division for the transition fraction, and the same
    ``t/N + d*(mass + dangling/N)`` update shape. Float literals embed
    ``repr()`` of the Python doubles the Spark side uses, so both
    engines compute from bit-identical constants.
    """
    t, d = repr(1.0 - damping), repr(damping)
    parts = [
        f"""
WITH edges AS MATERIALIZED (
  SELECT n1.n_name AS src, n2.n_name AS dst, SUM({REVENUE_SQL}) AS w
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (SELECT n_name AS node FROM nation),
outw AS MATERIALIZED (SELECT src, SUM(w) AS total_w FROM edges GROUP BY src),
frac AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.total_w AS DOUBLE) AS frac
  FROM edges e JOIN outw o ON e.src = o.src
),
r0 AS MATERIALIZED (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM nodes) AS pr
  FROM nodes
)"""
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
r{k} AS MATERIALIZED (
  SELECT n.node,
         CAST({t} AS DOUBLE) / (SELECT COUNT(*) FROM nodes)
         + CAST({d} AS DOUBLE) * (
             COALESCE(m.mass, CAST(0 AS DOUBLE))
             + (SELECT COALESCE(SUM(p.pr), CAST(0 AS DOUBLE)) FROM r{k - 1} p
                WHERE p.node NOT IN (SELECT src FROM outw))
               / (SELECT COUNT(*) FROM nodes)
           ) AS pr
  FROM nodes n
  LEFT JOIN (
    SELECT f.dst AS node, SUM(r.pr * f.frac) AS mass
    FROM frac f JOIN r{k - 1} r ON f.src = r.node
    GROUP BY f.dst
  ) m ON n.node = m.node
)"""
        )
    parts.append(
        f"""
SELECT node, round(pr, 6) AS pagerank FROM r{n_iter}"""
    )
    return "".join(parts)


@query("q_pagerank_nations", oracle=_pagerank_oracle())
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank of nations in the supplier→customer trade graph.

    Edges: revenue shipped from the supplier's nation to the ordering
    customer's nation (decimal-exact sums); nodes: all nations, so
    nations with no suppliers are dangling and exercise the
    uniform-redistribution term (they genuinely occur at sf0.001 where
    only 10 suppliers cover 25 nations). 10 damped power iterations.

    Scale: both nation dims broadcast into the fact scan; the edge
    build is one lineitem-sized shuffle down to ≤|N|² rows, and each
    PageRank round shuffles only the |V|-sized rank table (see
    operators/graph.py).
    """
    supplier, lineitem, orders, customer, nation = read_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    supp = F.broadcast(
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("src")
        )
    )
    cust = F.broadcast(
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey")).select(
            "c_custkey", F.col("n_name").alias("dst")
        )
    )
    edges = (
        lineitem.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("src", "dst")
        .agg(F.sum(_revenue()).alias("w"))
    )
    nodes = nation.select(F.col("n_name").alias("node"))
    ranks = pagerank(edges, nodes, n_iter=N_ITER, damping=DAMPING)
    return ranks.select("node", F.round("pr", 6).alias("pagerank"))


TRADE_EDGE_SQL = """
  SELECT DISTINCT n1.n_name AS src, n2.n_name AS dst
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
"""


@query(
    "q_triangle_count",
    oracle=f"""
    WITH trade AS ({TRADE_EDGE_SQL}),
    edges AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM trade
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation in the (undirected) nation
    trade graph — the standard graph clustering/cohesion primitive.

    The canonical ordered-wedge algorithm: edges canonicalize to
    ``u < v``, wedges form by joining edge (a,b) with (b,c), and the
    closing edge (a,c) is a semi-join — each triangle is produced
    exactly once as a < b < c. The nation graph is dim-bounded (≤|N|²
    edges), so the edge list broadcasts; at web scale the same plan
    shuffle-joins on the wedge key after degree-ordering the
    orientation (edges point low→high degree) so no hub node ever
    anchors a quadratic wedge set — the ordering here is the
    name-lexicographic special case of that orientation.
    """
    supplier, lineitem, orders, customer, nation = read_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    supp = F.broadcast(
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("src")
        )
    )
    cust = F.broadcast(
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey")).select(
            "c_custkey", F.col("n_name").alias("dst")
        )
    )
    trade = (
        lineitem.select("l_suppkey", "l_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = (
        trade.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # three consumers, one derivation
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(F.broadcast(e2), F.col("b") == F.col("b2"))
        .join(
            F.broadcast(e3),
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


BFS_MAX_HOPS = 4


@query(
    "q_bfs_hops",
    oracle=f"""
    WITH RECURSIVE trade AS ({TRADE_EDGE_SQL}),
    sources AS (
        SELECT n_name AS node
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    reach(node, hops) AS (
        SELECT node, 0 FROM sources
        UNION
        SELECT t.dst, r.hops + 1
        FROM reach r JOIN trade t ON t.src = r.node
        WHERE r.hops < {BFS_MAX_HOPS}
    )
    SELECT node, CAST(MIN(hops) AS INT) AS hops
    FROM reach GROUP BY node
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source k-hop reachability (BFS distances) over the
    DIRECTED nation trade graph, from every EUROPE nation — the
    influence-radius / crawl-frontier primitive the rank and triangle
    operators don't cover (``operators.graph.bfs_hops``).

    Frontier iteration joins only the ≤|V|-row frontier per round
    (never paths), anti-joins discovered nodes (first discovery =
    minimum hops), checkpoints each frontier, and exits early when a
    round discovers nothing — on this dense trade graph that is
    round 2 or 3, not ``BFS_MAX_HOPS``. FULL value oracle: a
    recursive CTE with the same hop bound (which also keeps the
    cyclic graph's SQL path enumeration finite) and MIN(hops)
    reduction.
    """
    supplier, lineitem, orders, customer, nation, region = read_tables(
        spark, sf_dir,
        "supplier", "lineitem", "orders", "customer", "nation", "region",
    )
    supp = F.broadcast(
        supplier.join(
            nation, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("src"))
    )
    cust = F.broadcast(
        customer.join(
            nation, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("dst"))
    )
    trade = (
        lineitem.select("l_suppkey", "l_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sources = (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("n_name").alias("node"))
    )
    from ..operators.graph import bfs_hops

    return bfs_hops(trade, sources, max_hops=BFS_MAX_HOPS).select(
        "node", F.col("hops").cast("int").alias("hops")
    )


@query(
    "q_cheapest_path",
    oracle=f"""
    WITH RECURSIVE trade AS (
        SELECT n1.n_name AS src, n2.n_name AS dst,
               CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                   AS BIGINT) AS w
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2
    ),
    sources AS (
        SELECT n_name AS node
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA'
    ),
    walk(node, cost, hops) AS (
        SELECT node, CAST(0 AS BIGINT), 0 FROM sources
        UNION
        SELECT t.dst, w.cost + t.w, w.hops + 1
        FROM walk w JOIN trade t ON t.src = w.node
        WHERE w.hops < {BFS_MAX_HOPS}
    )
    SELECT node, MIN(cost) AS cost FROM walk GROUP BY node
    """,
)
def q_cheapest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop cheapest route through the trade network from the
    AMERICA nations, each leg priced at its cheapest observed shipment
    (exact integer cost: min DECIMAL price × 10⁴) — the weighted twin
    of ``q_bfs_hops`` (``operators.graph.cheapest_path_hops``,
    Bellman–Ford relaxation rounds).

    Integer costs make min/sum exact on both engines; the recursive-
    CTE oracle shares the hop bound (finite on the cyclic graph) and
    reduces with the same MIN. Each round is one |V|-keyed shuffle
    join + per-node min, with early exit once no cost improves.
    """
    supplier, lineitem, orders, customer, nation, region = read_tables(
        spark, sf_dir,
        "supplier", "lineitem", "orders", "customer", "nation", "region",
    )
    from .numeric import dec

    supp = F.broadcast(
        supplier.join(
            nation, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("src"))
    )
    cust = F.broadcast(
        customer.join(
            nation, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("dst"))
    )
    trade = (
        lineitem.select("l_suppkey", "l_orderkey", "l_extendedprice")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            (F.min(dec(F.col("l_extendedprice"))) * 10000)
            .cast("bigint")
            .alias("w")
        )
    )
    sources = (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_name").alias("node"))
    )
    from ..operators.graph import cheapest_path_hops

    return cheapest_path_hops(trade, sources, max_hops=BFS_MAX_HOPS)
