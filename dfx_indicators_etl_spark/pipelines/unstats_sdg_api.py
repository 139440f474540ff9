"""UN Stats SDG API pipeline (reference
`/root/reference/src/dfx_etl/pipelines/unstats_sdg_api.py`).

Raw rows carry M49 numeric area codes, string-typed values (literal
``"NaN"`` for missing), and ``attributes`` / ``dimensions`` objects
whose keys vary by series. The reference explodes them into prefixed
columns (unstats_sdg_api.py:163-166); here they are map columns and
the dimension string resolves through the same ``Total``→``All …``
semantics without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    uri = "https://unstats.un.org/sdgapi/v1/sdg/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        self.fetch_json(f"{self.uri}Series/List")  # guarded — no client here
        raise AssertionError("unreachable")  # pragma: no cover


class Transformer(BaseTransformer):
    """M49→ISO3 mapping, NaN-string scrub, map-typed dimension resolve,
    ``"{description}, {units} [{series}]"`` naming
    (unstats_sdg_api.py:130-185)."""

    def __init__(self, country_mapping: DataFrame):
        self.country_mapping = country_mapping

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        mapped = ops.map_country_metadata(
            df, self.country_mapping, "geoAreaCode", "m49", "iso_alpha_3",
            output="country_code",
        )
        cleaned = (
            mapped.withColumn(
                "value",
                F.when(F.col("value") == "NaN", None).otherwise(F.col("value")),
            )
            .filter(F.col("country_code").isNotNull() & F.col("value").isNotNull())
        )
        # dimensions map → "name: per-row keys" resolved like the wide
        # case; attributes carry Units for the display name.
        dims = F.map_entries(F.col("dimensions"))
        present = F.filter(dims, lambda e: e["value"].isNotNull())
        rendered = F.transform(
            present,
            lambda e: F.when(
                F.lower(e["value"]) == "total",
                F.concat(F.lit("All "), F.lower(F.trim(e["key"]))),
            ).otherwise(e["value"]),
        )
        combined = F.array_join(rendered, "; ")
        return cleaned.select(
            F.concat(
                F.col("seriesDescription"),
                F.lit(", "),
                F.col("attributes")["Units"],
                F.lit(" ["),
                F.col("series"),
                F.lit("]"),
            ).alias("indicator_name"),
            "country_code",
            F.col("timePeriodStart").cast("int").alias("year"),
            F.col("value").cast("double").alias("value"),
            F.when(F.size(present) == 0, "Total").otherwise(combined).alias("dimension"),
        )
