"""World Bank Indicators API pipeline (reference
`/root/reference/src/dfx_etl/pipelines/world_bank_api.py`).

Raw rows are the API's JSON records with nested ``indicator`` /
``country`` objects. The reference joins per-row dicts into flat
columns (world_bank_api.py:167-175); here they are struct columns and
flattening is a projection — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


RAW_SCHEMA = (
    "indicator struct<id:string,value:string>, "
    "country struct<id:string,value:string>, "
    "countryiso3code string, date string, value double"
)


class Retriever(BaseRetriever):
    uri = "https://api.worldbank.org/v2/"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        indicator: str = "SP.POP.TOTL",
        per_page: int = 1000,
        max_pages: int = 50,
        **kwargs,
    ) -> DataFrame:
        """Paged JSON retrieval (reference world_bank_api.py:57-101):
        control-plane-sized API pages fetched on the driver via
        ``fetch_json`` (guarded — raises NotImplementedError without an
        HTTP client), then parallelized under the explicit nested
        schema the Transformer flattens. ``max_pages`` bounds a runaway
        pagination; the per-indicator payload is metadata-sized, never
        fact-table-sized, so the driver-side fetch matches the
        reference's architecture rather than working around Spark."""
        if payload is not None:
            return payload
        records: list = []
        page = 1
        while page <= max_pages:
            data = self.fetch_json(
                f"{self.uri}country/all/indicator/{indicator}",
                params={"format": "json", "per_page": per_page, "page": page},
            )
            meta, rows = data[0], data[1] or []
            records.extend(rows)
            if page >= int(meta.get("pages", 1)):
                break
            page += 1
        rows = [
            (
                (
                    (r.get("indicator") or {}).get("id"),
                    (r.get("indicator") or {}).get("value"),
                ),
                (
                    (r.get("country") or {}).get("id"),
                    (r.get("country") or {}).get("value"),
                ),
                r.get("countryiso3code"),
                r.get("date"),
                float(r["value"]) if r.get("value") is not None else None,
            )
            for r in records
        ]
        return spark.createDataFrame(rows, RAW_SCHEMA)


class Transformer(BaseTransformer):
    """Flatten nested structs, resolve ISO3 fallback chain, keep yearly
    rows, format indicator (world_bank_api.py:148-200)."""

    def __init__(self, country_mapping: DataFrame):
        self.country_mapping = country_mapping

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        blank_to_null = lambda c: F.when(F.trim(c) == "", None).otherwise(c)  # noqa: E731
        flat = df.select(
            blank_to_null(F.col("indicator.id")).alias("indicator_id"),
            blank_to_null(F.col("indicator.value")).alias("indicator_value"),
            blank_to_null(F.col("country.id")).alias("country_id"),
            blank_to_null(F.col("country.value")).alias("country_name"),
            blank_to_null(F.col("countryiso3code")).alias("countryiso3code"),
            "date",
            "value",
        )
        # country name → ISO3 (reference uses country_converter).
        flat = ops.map_country_metadata(
            flat, self.country_mapping, "country_name", "name", "iso_alpha_3",
            output="country_iso_from_name",
        )
        # combine_first chain (world_bank_api.py:181-184): explicit code,
        # else 2-letter id mapped?, else name-derived code.
        resolved = flat.withColumn(
            "country_code",
            F.coalesce("countryiso3code", "country_id", "country_iso_from_name"),
        )
        return (
            resolved.filter(F.col("country_code").isNotNull())
            .filter(F.col("date").rlike(r"^\d+$"))  # yearly rows only
            .filter(F.col("value").isNotNull())
            .select(
                ops.format_indicator_name("indicator_value", "indicator_id").alias(
                    "indicator_name"
                ),
                "country_code",
                F.col("date").cast("int").alias("year"),
                F.col("value").cast("double").alias("value"),
            )
        )
