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

from .base import BaseRetriever, BaseTransformer, union_all

__all__ = ["Retriever", "Transformer"]


class Retriever(BaseRetriever):
    """SDMX-CSV retrieval (reference unicef_sdmx_api.py:19-154).

    One fusion-json dataflow lookup yields both the observation
    dimension order (the query-option key positions) and the indicator
    metadata; then one ``format=csv`` GET per indicator, stacked with
    ``unionByName(allowMissingColumns)`` — the Spark form of the
    reference's ``pd.concat`` over its indicator loop.
    """

    uri = "https://sdmx.data.unicef.org/ws/public/sdmxapi/rest/"
    dataflow = "UNICEF,GLOBAL_DATAFLOW,1.0"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        max_indicators: int | None = None,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return payload
        meta = self.get_metadata(spark)
        fields = self._get_query_fields()
        codes = [r["code"] for r in meta.select("code").collect()]
        if max_indicators is not None:
            codes = codes[:max_indicators]
        frames = []
        for code in codes:
            df = self._get_data(spark, code, fields, **kwargs)
            if df is None:
                continue
            frames.append(df)
        if not frames:
            raise ValueError("No UNICEF SDMX series could be retrieved.")
        return union_all(frames)

    def _get_dataflow(self) -> dict:
        """Structure-only dataflow description
        (unicef_sdmx_api.py:60-74)."""
        params = {
            "format": "fusion-json",
            "dimensionAtObservation": "AllDimensions",
            "detail": "structureOnly",
            "includeMetrics": True,
            "includeMetadata": True,
            "match": "all",
            "includeAllAnnotations": True,
        }
        return self.fetch_json(f"{self.uri}data/{self.dataflow}", params=params)

    def _get_query_fields(self) -> list[str]:
        """Observation dimension ids, lowercase, in key order
        (unicef_sdmx_api.py:76-79)."""
        data = self._get_dataflow()
        observation = data["structure"]["dimensions"]["observation"]
        return [x["id"].lower() for x in observation]

    @staticmethod
    def _set_query_options(fields: list[str], **kwargs) -> str:
        """Dot-joined SDMX key (unicef_sdmx_api.py:81-97): one slot per
        dimension, ``+``-joined lists, ``all`` when nothing is pinned."""
        if set(fields) & set(kwargs):
            values = []
            for option in fields:
                value = kwargs.get(option, "")
                if isinstance(value, str):
                    values.append(value)
                elif isinstance(value, list):
                    values.append("+".join(value))
                else:
                    raise ValueError(
                        f"{option} must be either a string or list of "
                        f"strings, got {type(value)}."
                    )
            return ".".join(values)
        return "all"

    def get_metadata(self, spark: SparkSession) -> DataFrame:
        """INDICATOR dimension values present in the dataset
        (unicef_sdmx_api.py:99-113) as a (code, name) frame."""
        data = self._get_dataflow()
        observation = data["structure"]["dimensions"]["observation"]
        indicators = [
            x for x in observation if x["id"] == "INDICATOR"
        ][0]["values"]
        rows = [
            (ind.get("id"), ind.get("name"))
            for ind in indicators
            if ind.get("inDataset")
        ]
        return spark.createDataFrame(rows, "code string, name string")

    def _get_data(
        self,
        spark: SparkSession,
        indicator_code: str,
        fields: list[str] | None = None,
        **kwargs,
    ) -> DataFrame | None:
        """One indicator's observations as SDMX-CSV
        (unicef_sdmx_api.py:115-154)."""
        if fields is None:
            fields = self._get_query_fields()
        options = self._set_query_options(
            fields, indicator=indicator_code, **kwargs
        )
        params = {"format": "csv", "labels": "both"}
        return self.fetch_csv(
            spark, f"{self.uri}data/{self.dataflow}/{options}", params
        )


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
