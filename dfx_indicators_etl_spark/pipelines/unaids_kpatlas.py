"""UNAIDS Key Population Atlas pipeline (reference
`/root/reference/src/dfx_etl/pipelines/unaids_kpatlas.py`).

Transform rules (unaids_kpatlas.py:55-94): drop unnamed subgroup
categories, keep indicators with a single subgroup or the ``Total``
subgroup, name as ``"{indicator}, {unit}"``, then remove *every* member
of a duplicated series key (pandas ``keep=False``) — expressed here as
a window count filter, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    uri = "https://kpatlas.unaids.org/api/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        self.fetch_json(f"{self.uri}data")  # guarded — no client here
        raise AssertionError("unreachable")  # pragma: no cover


class Transformer(BaseTransformer):
    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        cleaned = df.filter(~F.col("Subgroup").startswith("Category"))
        # per-indicator distinct-subgroup count (pandas transform('nunique'))
        per_ind = Window.partitionBy("Indicator")
        counted = cleaned.withColumn(
            "__n_subgroups",
            F.size(F.collect_set("Subgroup").over(per_ind)),
        )
        kept = counted.filter(
            (F.col("__n_subgroups") == 1) | (F.col("Subgroup") == "Total")
        )
        shaped = kept.select(
            F.concat_ws(
                ", ", F.trim(F.col("Indicator")), F.trim(F.col("Unit"))
            ).alias("indicator_name"),
            F.col("Area ID").alias("country_code"),
            F.col("Time Period").cast("int").alias("year"),
            F.col("Data value").cast("double").alias("value"),
            F.col("Source").alias("source"),
        ).filter(F.col("value").isNotNull())
        # drop_duplicates(keep=False): every row of a conflicted key goes
        key = ("indicator_name", "country_code", "year")
        per_key = Window.partitionBy(*key)
        return (
            shaped.withColumn("__n", F.count("*").over(per_key))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
