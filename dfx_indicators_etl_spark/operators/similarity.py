"""Similarity search over embedding columns (SURVEY §2.C).

Brute-force cosine top-k as the exact baseline (query set broadcast
against the corpus — linear in corpus size, never corpus×corpus), and
a random-hyperplane LSH bucketed variant as the scale path (candidates
meet only inside buckets).

Dot products use higher-order array functions (zip_with + aggregate)
in float64 — JVM-side, no Python. Cosines are rounded *before* ranking
so rankings are stable across summation orders (and across engines for
the oracle check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "brute_force_topk", "hyperplane_lsh_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity, rounded for cross-engine/order stability."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Cost is |corpus|·|queries| dot products with no shuffle of the
    corpus (queries broadcast); the rank window shuffles only
    |corpus|·|queries| scored rows on query_id. Ties break on
    neighbor id → fully deterministic output.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


NUM_TABLES = 8  # L independent hash tables
PLANES_PER_TABLE = 6  # k sign bits per table


def _plane_component(table: int, p: int, j: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5)."""
    h = (
        F.lit(table * 1_000_003 + p * 10_007).cast("long") + j.cast("long") * 131
    ) * 2_654_435_761
    return (F.pmod(h, F.lit(10_000)).cast("double") / 10_000.0) - 0.5


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via multi-table random-hyperplane LSH.

    Standard (L, k)-LSH: NUM_TABLES independent tables, each keyed by
    the sign bits of PLANES_PER_TABLE fixed pseudo-random hyperplanes.
    A corpus vector is a candidate iff it collides with the query in
    ≥1 table; candidates score exactly and rank. At 100 TB the bucket
    equi-join replaces the brute-force scan — probing cost tracks
    bucket occupancy (sub-linear), recall is tunable via L and k.
    """

    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        # Hyperplane dot products via posexplode + one codegen'd
        # aggregate (48 sum expressions) — higher-order array functions
        # would evaluate interpreted, ~10× slower per row.
        exploded = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.posexplode(vec_col).alias("j", "x"),
        )
        dot_aggs = [
            F.sum(
                F.col("x").cast("double") * _plane_component(t, p, F.col("j"))
            ).alias(f"__d_{t}_{p}")
            for t in range(NUM_TABLES)
            for p in range(PLANES_PER_TABLE)
        ]
        dots = exploded.groupBy(id_alias).agg(
            F.first(vec_alias).alias(vec_alias), *dot_aggs
        )

        def bucket_for(table: int) -> Column:
            # Table id folded into the key → one equi-join serves all tables.
            out = F.lit(table << PLANES_PER_TABLE).cast("long")
            for p in range(PLANES_PER_TABLE):
                bit = (
                    F.when(F.col(f"__d_{table}_{p}") >= 0, F.lit(1 << p))
                    .otherwise(F.lit(0))
                    .cast("long")
                )
                out = out.bitwiseOR(bit)
            return out

        buckets = F.array(*[bucket_for(t) for t in range(NUM_TABLES)])
        return dots.select(
            id_alias, vec_alias, F.explode(buckets).alias("bucket")
        )

    c = with_buckets(corpus, "neighbor_id", "vec")
    q = with_buckets(queries, "query_id", "query_vec")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.col("query_vec"), F.col("vec"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
