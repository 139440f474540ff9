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


NESTED_SCHEMA = (
    "indicator_name string, country_code string, values map<string,double>"
)


class Retriever(BaseRetriever):
    """JSON retrieval (reference imf_datamapper_api.py:16-114).

    ``indicators`` yields ``{series_id: {label, unit, …}}``; per series
    one GET at ``{uri}{code}?periods=…`` returns
    ``values → indicator → country → {year: value}``, which lands as a
    map column and flattens declaratively — the Spark form of the
    reference's per-country ``pd.DataFrame(records.items())`` loop.
    """

    uri = "https://www.imf.org/external/datamapper/api/v1/"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        max_indicators: int | None = None,
        start_period: int = 1950,
        end_period: int = 2050,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return self.flatten(payload)
        meta = [
            r.asDict()
            for r in self.get_metadata(spark).collect()
        ]
        if max_indicators is not None:
            meta = meta[:max_indicators]
        rows: list = []
        for m in meta:
            values = self._get_data(
                m["code"], start_period, end_period, **kwargs
            )
            if values is None:
                continue
            name = f"{m['name']}, {m['unit']} [{m['code']}]"
            for country_code, records in values.items():
                rows.append(
                    (
                        name,
                        country_code,
                        {
                            str(year): float(v)
                            for year, v in records.items()
                            if v is not None
                        },
                    )
                )
        return self.flatten(spark.createDataFrame(rows, NESTED_SCHEMA))

    def get_metadata(self, spark: SparkSession) -> DataFrame:
        """``indicators`` endpoint → (code, name, unit)
        (imf_datamapper_api.py:52-71)."""
        data = self.fetch_json(f"{self.uri}indicators")
        rows = [
            (series_id, meta.get("label"), meta.get("unit"))
            for series_id, meta in data["indicators"].items()
            if series_id
        ]
        return spark.createDataFrame(rows, "code string, name string, unit string")

    def _get_data(
        self,
        indicator_code: str,
        start_period: int = 1950,
        end_period: int = 2050,
        **kwargs,
    ) -> dict | None:
        """One series' nested country→year→value dict
        (imf_datamapper_api.py:73-114)."""
        params = {
            "periods": ",".join(map(str, range(start_period, end_period)))
        } | kwargs
        data = self.fetch_json(f"{self.uri}{indicator_code}", params=params)
        if (values := data.get("values")) is None:
            return None
        return values.get(indicator_code)

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
