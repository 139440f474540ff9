"""IHME GHDx (healthdata.org) pipeline (reference
`/root/reference/src/dfx_etl/pipelines/healthdata_ghdx.py`).

Bulk CSV download of GBD estimates — the heaviest reference source and
a natural distributed CSV scan. Transform: location name → ISO3,
``"{metric} of {measure}"`` indicator naming, sex-category recode, and
dimension_* renames resolved by the shared combine step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from ..sources import read_csv
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer", "SEX_RECODE"]

# healthdata_ghdx.py:77-83 (SexEnum recode).
SEX_RECODE = {
    "Male": "Male",
    "Female": "Female",
    "Both sexes": "Both",
    "All sexes": "Total",
}


class Retriever(BaseRetriever):
    uri = "inputs/IHME-GBD/*.csv"

    def __call__(self, spark: SparkSession, path: str | None = None, **kwargs) -> DataFrame:
        return read_csv(spark, path or self.uri, **kwargs)


class Transformer(BaseTransformer):
    """healthdata_ghdx.py:56-93 as column expressions."""

    def __init__(self, country_mapping: DataFrame):
        self.country_mapping = country_mapping

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        mapped = ops.map_country_metadata(
            df, self.country_mapping, "location_name", "name", "iso_alpha_3",
            output="country_code",
        )
        sex = F.col("sex_name")
        for src, dst in SEX_RECODE.items():
            sex = F.when(F.col("sex_name") == src, dst).otherwise(sex)
        return mapped.select(
            "country_code",
            F.concat_ws(" of ", "metric_name", "measure_name").alias("indicator_name"),
            sex.alias("dimension_sex"),
            F.col("age_name").alias("dimension_age"),
            F.col("cause_name").alias("dimension_cause"),
            F.col("year").cast("int").alias("year"),
            F.col("val").cast("double").alias("value"),
        )
