"""WHO Global Health Observatory pipeline (reference
`/root/reference/src/dfx_etl/pipelines/who_gho_api.py`).

The GHO OData payload carries up to three dimension slots whose
*category names are data* (``Dim1Type``/``Dim1`` …). The reference
builds a per-row dict then joins it to a display string
(who_gho_api.py:152-176 + utils.py:191-220); here that is
``resolve_dimension_pairs`` over array expressions, and the
deterministic drop-duplicates (who_gho_api.py:183-190) is a
``row_number`` window instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]


RAW_SCHEMA = (
    "indicator_name string, SpatialDim string, TimeDim int, "
    "Dim1Type string, Dim1 string, Dim2Type string, Dim2 string, "
    "Dim3Type string, Dim3 string, DataSourceDim string, "
    "NumericValue double"
)


class Retriever(BaseRetriever):
    uri = "https://ghoapi.azureedge.net/api/"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        indicator_code: str = "WHOSIS_000001",
        max_pages: int = 50,
        **kwargs,
    ) -> DataFrame:
        """OData retrieval (reference who_gho_api.py:57-88): one
        metadata lookup resolves the indicator display name, then the
        per-indicator value feed drains (following ``@odata.nextLink``
        continuations up to ``max_pages``) — driver-side control-plane
        payloads parallelized under the explicit raw schema the
        Transformer reshapes. Guarded: raises NotImplementedError when
        no HTTP client is available."""
        if payload is not None:
            return payload
        meta = self.fetch_json(
            f"{self.uri}Indicator",
            params={"$filter": f"IndicatorCode eq '{indicator_code}'"},
        )
        meta_rows = meta.get("value") or []
        name = (
            meta_rows[0].get("IndicatorName", indicator_code)
            if meta_rows
            else indicator_code
        )
        records: list = []
        url: str | None = f"{self.uri}{indicator_code}"
        pages = 0
        while url and pages < max_pages:
            data = self.fetch_json(url)
            records.extend(data.get("value") or [])
            url = data.get("@odata.nextLink")
            pages += 1

        def _year(v):
            try:
                return int(v) if v is not None else None
            except (TypeError, ValueError):
                return None

        rows = [
            (
                name,
                r.get("SpatialDim"),
                _year(r.get("TimeDim")),
                r.get("Dim1Type"),
                r.get("Dim1"),
                r.get("Dim2Type"),
                r.get("Dim2"),
                r.get("Dim3Type"),
                r.get("Dim3"),
                r.get("DataSourceDim"),
                float(r["NumericValue"])
                if r.get("NumericValue") is not None
                else None,
            )
            for r in records
        ]
        return spark.createDataFrame(rows, RAW_SCHEMA)


def _snake(col: Column) -> Column:
    """``to_snake_case`` (utils.py:158-188) as a column expression.

    Python ``str.strip()`` removes ALL whitespace (tabs, newlines), but
    ``F.trim`` strips only spaces — a category like ``"Age Group\\n"``
    would keep a trailing underscore under trim. Strip with a regex so
    the column form matches the reference (and the driver-side
    ``operators.indicator.to_snake_case``) byte-for-byte, including the
    reference's documented ``" Time\\n\\n\\nPeriod  "`` → ``time_period``
    example.
    """
    stripped = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.regexp_replace(F.lower(stripped), r"\s+", "_")


class Transformer(BaseTransformer):
    """Dimension-dict resolution + deterministic dedup
    (who_gho_api.py:131-190)."""

    dim_slots: int = 3

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        source = F.replace(
            F.col("DataSourceDim"), F.lit("DATASOURCE_"), F.lit("")
        )
        # (snake(category), value stripped of "CATEGORY_") per slot, the
        # source appended as a pseudo-dimension to keep rows unique.
        pairs = [
            (
                F.replace(_snake(F.col(f"Dim{i}Type")), F.lit("_"), F.lit(" ")),
                F.when(
                    F.col(f"Dim{i}Type").isNotNull(),
                    F.expr(
                        f"replace(Dim{i}, concat(Dim{i}Type, '_'), '')"
                    ),
                ),
            )
            for i in range(1, self.dim_slots + 1)
            if f"Dim{i}" in df.columns
        ]
        pairs.append((F.lit("source"), source))
        shaped = df.select(
            "indicator_name",
            F.col("SpatialDim").alias("country_code"),
            F.col("TimeDim").cast("int").alias("year"),
            ops.resolve_dimension_pairs(pairs).alias("dimension"),
            source.alias("source"),
            F.col("NumericValue").cast("double").alias("value"),
        )
        # who_gho_api.py:183-190: sort by all non-value columns, keep
        # first per key (key excludes `source`).
        return ops.dedup_first(
            shaped,
            ["indicator_name", "country_code", "year", "dimension"],
            ["source", "value"],
        )
