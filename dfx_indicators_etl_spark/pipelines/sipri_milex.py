"""SIPRI Military Expenditure pipeline (reference
`/root/reference/src/dfx_etl/pipelines/sipri_milex.py`).

The source is a multi-sheet XLSX keyed by country *name* with one
column per year; the transform is wide→long melt + name→ISO3 mapping
(sipri_milex.py:99-147). The retriever needs an XLSX reader + network,
neither of which the harness ships, so it accepts a pre-staged raw
frame instead; the Transformer is the real distributed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicator as ops
from .base import BaseRetriever, BaseTransformer

__all__ = ["Retriever", "Transformer", "METADATA"]

# Sheet → indicator display name (sipri_milex.py:55-72).
METADATA = {
    "Current US$": "Military expenditure by country in $current US m. [SIPRI_MILEXT_CURRENT_USD]",
    "Share of GDP": "Military expenditure by country as a share of GDP [SIPRI_MILEXT_SHARE_OF_GDP]",
    "Per capita": "Military expenditure per capita, in current US$ [SIPRI_MILEXT_PER_CAPITA]",
    "Share of Govt. spending": "Military expenditure as a percentage of general government expenditure [SIPRI_MILEXT_SHARE_OF_GOV_SPENDING]",
}


class Retriever(BaseRetriever):
    uri = "https://www.sipri.org/sites/default/files/SIPRI-Milex-data-1949-2024_2.xlsx"

    def __call__(self, spark: SparkSession, payload: DataFrame | None = None, **kwargs) -> DataFrame:
        if payload is not None:
            return payload
        raise NotImplementedError(
            "XLSX-over-HTTP retrieval is unavailable here; pre-stage the "
            "sheets (one frame, `indicator_name` stamped per sheet) and "
            "pass them as `payload`."
        )


class Transformer(BaseTransformer):
    """Wide year columns → canonical long rows (sipri_milex.py:99-147)."""

    def __init__(self, country_mapping: DataFrame):
        # name → ISO3 lookup standing in for `country_converter`.
        self.country_mapping = country_mapping

    def transform(self, df: DataFrame, **kwargs) -> DataFrame:
        id_cols = ["Country", "indicator_name"]
        year_cols = [c for c in df.columns if c.isdigit()]
        long = ops.melt(
            df.select(*id_cols, *year_cols),
            id_cols,
            year_cols,
            var_name="year",
            value_name="value",
        )
        long = ops.map_country_metadata(
            long, self.country_mapping, "Country", "name", "iso_alpha_3",
            output="country_code",
        ).filter(F.col("country_code").isNotNull())
        return long.withColumn("year", F.col("year").cast("int"))
