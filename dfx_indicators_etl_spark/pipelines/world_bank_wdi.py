"""World Development Indicators bulk-CSV pipeline (reference
`/root/reference/src/dfx_etl/pipelines/world_bank_wdi.py`).

The WDI bulk download is a single wide CSV (country × indicator rows,
year columns). Unlike the reference's pandas read, the retriever here
is a distributed CSV scan — the bulk file is hundreds of MB and the
melt multiplies rows ~60×, exactly the shape Spark handles and a
single pandas process does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from ..sources import read_csv
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer"]

ID_COLUMNS = {
    "Country Name": "country_name",
    "Country Code": "country_code",
    "Indicator Name": "indicator_name",
    "Indicator Code": "indicator_code",
}


class Retriever(BaseRetriever):
    uri = "inputs/WDI_CSV/WDICSV.csv"

    def __call__(self, spark: SparkSession, path: str | None = None, **kwargs) -> DataFrame:
        return read_csv(spark, path or self.uri, **kwargs)


class Transformer(BaseTransformer):
    """Melt year columns, cut to >=2015, format indicator display name
    (world_bank_wdi.py:59-93)."""

    year_floor: int = 2015

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        year_cols = [c for c in df.columns if c.isdigit()]
        renamed = df.select(
            *[F.col(src).alias(dst) for src, dst in ID_COLUMNS.items()], *year_cols
        )
        long = ops.melt(
            renamed, list(ID_COLUMNS.values()), year_cols,
            var_name="year", value_name="value",
        )
        return (
            long.withColumn("year", F.col("year").cast("int"))
            .filter(F.col("year") >= self.year_floor)
            .withColumn(
                "indicator_name",
                ops.format_indicator_name("indicator_name", "indicator_code"),
            )
        )
