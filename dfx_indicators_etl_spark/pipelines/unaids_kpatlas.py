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

from ..sources import read_csv
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    """Storage-based retrieval (reference unaids_kpatlas.py:18-48): the
    source is a manually-downloaded ``KPAtlasDB_*_en.csv`` read from
    the storage backend, not an HTTP API — here a distributed Spark CSV
    scan of ``path`` (or ``uri`` under the configured storage root)."""

    uri = "inputs/KPAtlasDB_2025_en.csv"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        path: str | None = None,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return payload
        if path is None:
            from ..sources import sinks

            path = f"{sinks.resolve_storage_root()}/{self.uri}"
        return read_csv(spark, path, **kwargs)


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
