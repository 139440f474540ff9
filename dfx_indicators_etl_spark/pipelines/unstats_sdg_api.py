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


RAW_SCHEMA = (
    "series string, seriesDescription string, geoAreaCode string, "
    "timePeriodStart string, value string, "
    "attributes map<string,string>, dimensions map<string,string>"
)


class Retriever(BaseRetriever):
    """Paged JSON retrieval (reference unstats_sdg_api.py:17-129).

    ``series/list`` yields the series catalogue; per series,
    ``Series/Data`` pages drain at ``pageSize=1000`` until the first
    response's ``totalPages`` is reached (bounded by ``max_pages``
    against runaway catalogues). The nested per-row ``attributes`` /
    ``dimensions`` objects land as map columns under an explicit
    schema — the shape the Transformer's map-expression resolve
    expects.
    """

    uri = "https://unstats.un.org/sdgapi/v1/sdg/"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        max_series: int | None = None,
        max_pages: int = 50,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return payload
        meta = self.get_metadata(spark)
        codes = [r["code"] for r in meta.select("code").collect()]
        if max_series is not None:
            codes = codes[:max_series]
        records: list = []
        for code in codes:
            records.extend(self._get_data(code, max_pages=max_pages, **kwargs))
        rows = [
            (
                r.get("series"),
                r.get("seriesDescription"),
                str(r["geoAreaCode"]) if r.get("geoAreaCode") is not None else None,
                str(r["timePeriodStart"]) if r.get("timePeriodStart") is not None else None,
                str(r["value"]) if r.get("value") is not None else None,
                {k: str(v) for k, v in (r.get("attributes") or {}).items() if v is not None},
                {k: str(v) for k, v in (r.get("dimensions") or {}).items() if v is not None},
            )
            for r in records
        ]
        return spark.createDataFrame(rows, RAW_SCHEMA)

    def get_metadata(self, spark: SparkSession) -> DataFrame:
        """Series catalogue (unstats_sdg_api.py:53-66):
        ``{code, description}`` → (code, name)."""
        data = self.fetch_json(f"{self.uri}series/list")
        rows = [(s.get("code"), s.get("description")) for s in data]
        return spark.createDataFrame(rows, "code string, name string")

    def _get_data(
        self, indicator_code: str, max_pages: int = 50, **kwargs
    ) -> list[dict]:
        """Drain one series' pages (unstats_sdg_api.py:68-129)."""
        pages, records = self._get_page(indicator_code, 1, **kwargs)
        out = list(records)
        for page in range(2, min(pages, max_pages) + 1):
            _, records = self._get_page(indicator_code, page, **kwargs)
            out.extend(records)
        return out

    def _get_page(
        self, indicator_code: str, page: int, **kwargs
    ) -> tuple[int, list[dict]]:
        params = {
            "seriesCode": indicator_code,
            "pageSize": 1_000,
            "page": page,
        } | kwargs
        data = self.fetch_json(f"{self.uri}Series/Data", params=params)
        return data["totalPages"], data.get("data") or []


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
