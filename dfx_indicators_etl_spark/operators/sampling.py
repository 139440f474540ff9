"""Deterministic sampling and dataset-split operators.

Training-data pipelines need samples and train/test splits that are
(a) reproducible across runs and engines and (b) computable in one
distributed pass without a global sort of the corpus. Both operators
here key off ``md5`` of a stable id — a content-independent, uniform,
engine-portable hash — so the selection is a pure function of the row
and the result is identical on Spark and any ANSI-SQL engine
(oracle-checked by ``sample_stratified`` / ``sample_train_test``).

Scale notes (100 TB): ``hash_split`` is a narrow map — no shuffle at
all. ``stratified_sample`` shuffles once on the strata key; with k
rows kept per stratum the window input per reducer is the stratum
size, so heavily skewed strata should pre-aggregate with the
``operators.scale`` salting tools first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "stratified_sample",
    "hash_split",
    "hash_uniform",
    "weighted_sample",
    "temperature_sample",
    "priority_sample",
]


def _hash_order(key_col: str) -> F.Column:
    """Engine-portable pseudo-random ordering: md5 of the stringified key."""
    return F.md5(F.col(key_col).cast("string"))


def hash_uniform(key_col: str, salt: str = "") -> F.Column:
    """Deterministic uniform in [0, 1) from a row key.

    First 8 md5 hex chars of ``salt || key`` as a 32-bit integer over
    2³² — the same ``conv(substr(md5(…)))`` stream DuckDB reproduces
    with ``CAST(concat('0x', substr(md5(…), 1, 8)) AS BIGINT)``, so
    any acceptance rule built on it is value-oracle-able. Change
    ``salt`` to draw an independent uniform from the same key.
    """
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") / float(
        2**32
    )


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    rate_col: str,
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its uniform
    draw falls under its group's acceptance rate.

    The data-mixing step of a training pipeline (down-sample
    over-represented languages/sources to a target distribution),
    expressed so the survivor set is a pure function of row keys: keep
    iff ``hash_uniform(key) < rates[group]``. Pure narrow map — no
    shuffle, no RNG state, identical on any engine with md5 (the
    per-group expected rate is exact in distribution and the actual
    survivor set is exactly reproducible).
    """
    rate = F.lit(float(default_rate))
    for group, r in sorted(rates.items()):
        rate = F.when(F.col(rate_col) == group, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_uniform(key_col, salt) < rate)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    temperature: float = 2.0,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled group rebalancing — the standard multilingual
    pretraining mix (sampling probabilities ∝ p^(1/T), T > 1 upweights
    low-resource groups).

    Unlike ``weighted_sample`` the acceptance rates are COMPUTED from
    the corpus's own group distribution: with p_g the group's share,
    rate_g ∝ p_g^(1/T − 1), normalized so the rarest group keeps
    everything. The corpus share cancels to a pure count ratio,
    rate_g = (c_min / c_g)^(1 − 1/T), so the rates are exact integer-
    ratio arithmetic; for the default T = 2 the exponent is ½ and the
    rate is ``sqrt(c_min / c_g)`` — sqrt is correctly rounded IEEE on
    every engine, making the survivor set value-oracle-able. Rows keep
    iff their portable md5 uniform falls under the group's rate.

    Plan shape: one map-side-combinable group count (group-cardinality-
    sized), a broadcast of the tiny rate table, and a narrow filter —
    no corpus shuffle at any scale. The rate join is NULL-safe: a NULL
    group is a real group (counted, priced, and sampled like any
    other), not a silent drop.
    """
    exponent = 1.0 - 1.0 / float(temperature)
    counts = df.groupBy(group_col).agg(F.count("*").alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    ratio = F.col("__cmin").cast("double") / F.col("__c").cast("double")
    rate = (
        F.sqrt(ratio)
        if exponent == 0.5
        else F.pow(ratio, F.lit(exponent))
    )
    rates = counts.join(F.broadcast(cmin)).select(
        F.col(group_col).alias("__g"), rate.alias("__rate")
    )
    # Null-safe join (ADVICE r7): a NULL group is a real group — the
    # counts aggregate already prices it, so its rows must reach their
    # rate instead of silently vanishing through an equi-join.
    return (
        df.join(
            F.broadcast(rates), F.col(group_col).eqNullSafe(F.col("__g"))
        )
        .filter(hash_uniform(key_col, salt) < F.col("__rate"))
        .withColumn("rate", F.round("__rate", 6))
        .drop("__rate", "__g")
    )


def stratified_sample(
    df: DataFrame, strata: Sequence[str], key_col: str, k: int
) -> DataFrame:
    """Keep the first ``k`` rows per stratum under md5(key) ordering.

    Equivalent to a per-stratum uniform sample of fixed size, but fully
    deterministic: the survivor set depends only on key values, never
    on partitioning or execution order. One shuffle (on the strata
    columns); the tie-break on the raw key makes duplicates stable.
    """
    w = Window.partitionBy(*strata).orderBy(
        _hash_order(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    test_threshold: str = "cc",
    split_col: str = "split",
) -> DataFrame:
    """Label each row ``train``/``test`` by a hash bucket of its key.

    The first two hex chars of md5(key) give 256 uniform buckets;
    rows at or above ``test_threshold`` (lexicographic on hex) go to
    ``test``. The default ``"cc"`` ≈ a 80/20 split. Pure map — no
    shuffle, no state, stable under reruns and repartitioning.
    """
    bucket = F.substring(_hash_order(key_col), 1, 2)
    return df.withColumn(
        split_col,
        F.when(bucket >= F.lit(test_threshold), "test").otherwise("train"),
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    n: int,
    group_cols: Sequence[str] = (),
    salt: str = "prio",
) -> DataFrame:
    """Deterministic weighted top-n sampling without replacement —
    priority sampling (Duffield–Lund–Thorup, JACM 2007): each row draws
    priority ``w / u`` from its portable md5 uniform and the n highest
    priorities per group win.

    Inclusion probability is ∝ weight for n ≪ group size (the
    weighted-reservoir answer for "keep the n most training-worthy
    docs, long ones upweighted, reproducibly"). Unlike the classic
    A-ES key ``u^(1/w)`` this needs only one IEEE division — no
    transcendentals — so the survivor set and the emitted priorities
    are bit-identical on any engine with md5 (value-oracle-able).

    Plan: narrow priority computation, then one shuffle to the group
    key with a rank window whose per-partition state is the top-n heap
    — never corpus-sized. Ties are impossible in practice (64-bit
    priorities) but doubly broken on the key for total determinism.
    The uniform is floored at 2⁻³³ (below its real resolution of
    2⁻³²): a key whose md5 starts with eight zero hex chars draws
    u = 0 — expected at billions of rows — and w/0 would throw under
    ANSI or sort the row LAST as NULL when it should be a certain
    include; the floor gives it the top priority it deserves.
    """
    groups = list(group_cols)
    u = F.greatest(hash_uniform(key_col, salt), F.lit(2.0 ** -33))
    pr = F.col(weight_col).cast("double") / u
    ranked = df.withColumn("__priority", pr)
    w = Window.partitionBy(*groups).orderBy(
        F.col("__priority").desc(), F.col(key_col)
    )
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .withColumn("priority", F.round("__priority", 6))
        .drop("__priority")
    )
