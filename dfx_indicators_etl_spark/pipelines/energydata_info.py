"""energydata.info ELECCAP pipeline (reference
`/root/reference/src/dfx_etl/pipelines/energydata_info.py`).

The raw sheet uses merged cells, so the reference forward-fills down
the sheet (energydata_info.py:74). Forward-fill is inherently
row-order-dependent: the raw frame must carry a ``_row_id`` order
column and the fill runs as a ``last(ignorenulls)`` running window.
The sheet is a small driver-side extract, so the single-partition
window is fine; the post-fill pipeline is fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import indicator as ops
from ..sources.xlsx import xlsx_to_spark
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer", "INDICATOR_NAME", "read_eleccap_xlsx"]

INDICATOR_NAME = (
    "Installed electricity capacity by country/area (MW) by Country/area, "
    "Technology, Grid connection and Year [ELECCAP]"
)

RAW_COLUMNS = [
    "country",
    "dimension_energy_technology",
    "dimension_grid_connection",
    "year",
    "value",
]


class Retriever(BaseRetriever):
    """XLSX-over-URL retrieval (reference energydata_info.py:16-44:
    ``pd.read_excel(url, header=1, na_values=[".."])``): workbook bytes
    download via the guarded ``fetch_bytes``, parsed with the engine's
    OOXML reader at the same header row / sentinel settings, with a
    ``_row_id`` order column prepended for the merged-cell
    forward-fill."""

    uri = (
        "https://energydata.info/dataset/b33e5af4-bd51-4ee0-a062-29438471db27"
        "/resource/6938ec3a-f7bb-4493-86ba-f28faa62f139/download"
        "/eleccap_20220404-201215.xlsx"
    )

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        path: str | None = None,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return payload
        if path is not None:
            return read_eleccap_xlsx(spark, path)
        import os
        import tempfile

        data = self.fetch_bytes(self.uri)
        fd, tmp = tempfile.mkstemp(suffix=".xlsx")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return read_eleccap_xlsx(spark, tmp)
        finally:
            os.unlink(tmp)


def read_eleccap_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """Parse the ELECCAP workbook the way the reference reads it
    (header on the second sheet row, ``..`` → null) plus the explicit
    row-order column the distributed forward-fill requires."""
    return xlsx_to_spark(
        spark, path, header_row=1, na_values=("..",), row_id_col="_row_id"
    )


class Transformer(BaseTransformer):
    """ffill → name→ISO3 → constant indicator → dedup
    (energydata_info.py:51-86)."""

    def __init__(self, country_mapping: DataFrame):
        self.country_mapping = country_mapping

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        named = df.select("_row_id", *[
            F.col(src).alias(dst) for src, dst in zip(df.columns[1:], RAW_COLUMNS)
        ]) if df.columns[0] == "_row_id" else df.toDF("_row_id", *RAW_COLUMNS)
        fill = Window.orderBy("_row_id").rowsBetween(Window.unboundedPreceding, 0)
        filled = named.select(
            "_row_id",
            *[
                F.last(c, ignorenulls=True).over(fill).alias(c)
                for c in RAW_COLUMNS
            ],
        )
        mapped = ops.map_country_metadata(
            filled, self.country_mapping, "country", "name", "iso_alpha_3",
            output="country_code",
        )
        return (
            mapped.filter(F.col("country_code").isNotNull())  # 'not found' rows
            .filter(F.col("value").isNotNull())
            .withColumn("indicator_name", F.lit(INDICATOR_NAME))
            .withColumn("year", F.col("year").cast("int"))
            .withColumn("value", F.col("value").cast("double"))
            .drop("_row_id")
            .dropDuplicates()
        )
