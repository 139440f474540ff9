"""ILOSTAT SDMX API pipeline (reference
`/root/reference/src/dfx_etl/pipelines/ilo_sdmx_api.py`).

SDMX observations arrive coded (``SEX_F``, ``AGE_AGGREGATE_Y25-54``);
the reference downloads per-dimension codelists and maps codes →
labels (ilo_sdmx_api.py:185-192). Codelists are small reference data:
they broadcast as literal map expressions, keeping the decode inside
codegen instead of one join per dimension.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer", "DIMENSIONS"]

DIMENSIONS = ("SEX", "AGE", "GEO", "EDU")


class Retriever(BaseRetriever):
    uri = "https://sdmx.ilo.org/rest/"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        self.fetch_json(f"{self.uri}data/ILO,DF_EMP_TEMP_SEX_AGE_NB")  # guarded
        raise AssertionError("unreachable")  # pragma: no cover


def _decode(col: str, mapping: dict[str, str], default: Column | None = None) -> Column:
    if not mapping:
        return default if default is not None else F.col(col)
    table = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    decoded = table[F.col(col)]
    fallback = default if default is not None else F.col(col)
    return F.coalesce(decoded, fallback)


class Transformer(BaseTransformer):
    """ilo_sdmx_api.py:147-197: annual subset, AGGREGATE band filter,
    codelist decode, dimension renames."""

    def __init__(self, codelists: dict[str, dict[str, str]] | None = None):
        # dimension → {code: label}, as fetched from the SDMX registry.
        self.codelists = codelists or {}

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        out = df.filter(F.col("FREQ") == "A")
        for column in ("AGE", "EDU"):  # keep aggregate bands (null passes)
            if column in df.columns:
                out = out.filter(
                    F.col(column).contains("AGGREGATE") | F.col(column).isNull()
                )
        selected = [
            F.col("REF_AREA").alias("country_code"),
            F.col("indicator_name"),
            F.col("TIME_PERIOD").cast("int").alias("year"),
            F.col("OBS_VALUE").cast("double").alias("value"),
            F.col("SOURCE").alias("source") if "SOURCE" in df.columns else F.lit(None).alias("source"),
        ]
        for dim in DIMENSIONS:
            if dim in df.columns:
                selected.append(
                    _decode(dim, self.codelists.get(dim, {})).alias(
                        f"dimension_{dim.lower()}"
                    )
                )
        if "UNIT_MEASURE_TYPE" in df.columns:
            selected.append(
                _decode(
                    "UNIT_MEASURE_TYPE",
                    self.codelists.get("UNIT_MEASURE", {}),
                    default=F.lit("Unknown"),
                ).alias("unit")
            )
        return out.select(*selected).filter(F.col("value").isNotNull())
