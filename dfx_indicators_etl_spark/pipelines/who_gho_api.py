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


class Retriever(BaseRetriever):
    uri = "https://ghoapi.azureedge.net/api/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        self.fetch_json(f"{self.uri}Indicator")  # guarded — no client here
        raise AssertionError("unreachable")  # pragma: no cover


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
