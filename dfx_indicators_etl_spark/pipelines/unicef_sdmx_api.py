"""UNICEF SDMX API pipeline (reference
`/root/reference/src/dfx_etl/pipelines/unicef_sdmx_api.py`).

Values arrive as strings with bound markers (``<1``, ``>95%``); the
reference strips the markers and coerces (unicef_sdmx_api.py:189-195).
With ANSI off, a failed cast yields NULL — the exact
``pd.to_numeric(errors="coerce")`` semantics, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    uri = "https://sdmx.data.unicef.org/ws/public/sdmxapi/rest/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        self.fetch_json(f"{self.uri}data/UNICEF,GLOBAL_DATAFLOW")  # guarded
        raise AssertionError("unreachable")  # pragma: no cover


class Transformer(BaseTransformer):
    """unicef_sdmx_api.py:162-201 as column expressions."""

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        yearly = df.filter(F.trim(F.col("TIME_PERIOD")).rlike(r"^\d{4}$"))
        value = F.btrim(F.col("OBS_VALUE"), F.lit("<>")).cast("double")
        return yearly.select(
            F.col("REF_AREA").alias("country_code"),
            F.concat(
                F.col("Indicator"),
                F.lit(", "),
                F.col("Unit of measure"),
                F.lit(" ["),
                F.col("INDICATOR"),
                F.lit("]"),
            ).alias("indicator_name"),
            F.col("Sex").alias("dimension_sex"),
            F.col("Current age").alias("dimension_age"),
            F.trim(F.col("TIME_PERIOD")).cast("int").alias("year"),
            value.alias("value"),
            F.coalesce("DATA_SOURCE", "SOURCE_LINK").alias("source"),
        ).filter(F.col("value").isNotNull())
