"""IMF DataMapper API pipeline (reference
`/root/reference/src/dfx_etl/pipelines/imf_datamapper_api.py`).

The reference retriever reshapes the nested
``values → indicator → country → year`` JSON while fetching, so its
transformer is the identity (imf_datamapper_api.py:120-136). Here the
retriever accepts the nested payload as a map-typed frame and does the
same flattening declaratively; the transformer stays the identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    uri = "https://www.imf.org/external/datamapper/api/v1/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return self.flatten(payload)
        self.fetch_json(f"{self.uri}indicators")  # guarded — no client here
        raise AssertionError("unreachable")  # pragma: no cover

    @staticmethod
    def flatten(nested: DataFrame) -> DataFrame:
        """``(indicator_name, country_code, values: map<year,double>)`` →
        long rows, the Spark form of the retriever's per-year dict loop."""
        exploded = nested.select(
            "indicator_name",
            "country_code",
            F.explode("values").alias("year_str", "value"),
        )
        return exploded.select(
            "indicator_name",
            "country_code",
            F.col("year_str").cast("int").alias("year"),
            F.col("value").cast("double").alias("value"),
        )


class Transformer(BaseTransformer):
    """Identity (imf_datamapper_api.py:120-136) — retrieval already
    yields canonical columns."""

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return df
