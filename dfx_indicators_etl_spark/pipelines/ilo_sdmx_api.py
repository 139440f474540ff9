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

from .base import BaseRetriever, BaseTransformer, union_all

__all__ = ["Retriever", "Transformer", "DIMENSIONS"]

DIMENSIONS = ("SEX", "AGE", "GEO", "EDU")

# The reference's mask set (ilo_sdmx_api.py:21) additionally contains
# NOC ("no classification"): NOC-coded indicators ARE retrieved, but
# the NOC column is dropped by the transformer's reindex
# (ilo_sdmx_api.py:160-172 lists no NOC output), so NOC never appears
# among the decoded ``dimension_*`` columns.
MASK_DIMENSIONS = frozenset(DIMENSIONS) | {"NOC"}


class Retriever(BaseRetriever):
    """SDMX-CSV retrieval (reference ilo_sdmx_api.py:53-139).

    Indicator codes come from the ``CL_INDICATOR`` codelist (SDMX-ML
    XML); codes embed their disaggregations (``SDG_0852_SEX_AGE_RT``)
    and only those whose dimension set ⊆ {SEX, AGE, GEO, EDU, NOC}
    survive, matching the reference's mask (ilo_sdmx_api.py:74-85).
    Data arrives one ``format=csvfile`` GET per indicator under the
    ``ILO,{code}`` dataflow convention.
    """

    uri = "https://sdmx.ilo.org/rest/"

    def __call__(
        self,
        spark: SparkSession,
        payload: DataFrame | None = None,
        max_indicators: int | None = None,
        **kwargs,
    ) -> DataFrame:
        if payload is not None:
            return payload
        meta = [
            (code, name)
            for code, name in self._get_codelist_mapping("INDICATOR").items()
            if self._supported_disaggregation(code)
        ]
        if max_indicators is not None:
            meta = meta[:max_indicators]
        frames = []
        for code, name in meta:
            df = self._get_data(spark, code, **kwargs)
            if df is None:
                continue
            frames.append(
                df.withColumn("indicator_name", F.lit(f"{name} [{code}]"))
            )
        if not frames:
            raise ValueError("No ILO SDMX series could be retrieved.")
        return union_all(frames)

    def get_metadata(self, spark: SparkSession) -> DataFrame:
        """Indicator catalogue from the CL_INDICATOR codelist
        (reference ilo_sdmx_api.py:92-103) as a (code, name) frame."""
        mapping = self._get_codelist_mapping("INDICATOR")
        return spark.createDataFrame(
            list(mapping.items()), "code string, name string"
        )

    @staticmethod
    def _supported_disaggregation(code: str) -> bool:
        """ilo_sdmx_api.py:76-83: the middle ``_``-separated segments
        name the disaggregations; keep codes fully inside the
        reference's mask set {SEX, AGE, GEO, EDU, NOC} — NOC-coded
        indicators are retrieved (matching the reference) even though
        the transformer later drops the NOC column."""
        return not set(code.split("_")[2:-1]) - MASK_DIMENSIONS

    def _get_codelist_mapping(self, name: str) -> dict[str, str]:
        """Codelist id → English name from the SDMX-ML registry
        (ilo_sdmx_api.py:24-50); stdlib ElementTree, driver-side
        control-plane data."""
        import xml.etree.ElementTree as ET
        from io import StringIO

        text = self.fetch_text(f"{self.uri}codelist/ILO/CL_{name}")
        namespaces = dict(
            node
            for _, node in ET.iterparse(StringIO(text), events=["start-ns"])
        )
        namespaces["xml"] = "http://www.w3.org/XML/1998/namespace"
        root = ET.fromstring(text)
        return {
            element.get("id"): element.find(
                "common:Name[@xml:lang='en']", namespaces
            ).text
            for element in root.findall(".//structure:Code", namespaces)
        }

    def fetch_codelists(self) -> dict[str, dict[str, str]]:
        """All dimension + unit codelists, shaped for the Transformer's
        ``codelists`` argument (the reference decodes inline at
        ilo_sdmx_api.py:185-192)."""
        return {
            name: self._get_codelist_mapping(name)
            for name in (*DIMENSIONS, "UNIT_MEASURE")
        }

    def _get_data(
        self,
        spark: SparkSession,
        indicator_code: str,
        start_period: str = "2015-01-01",
        end_period: str = "2025-12-31",
        **kwargs,
    ) -> DataFrame | None:
        """One indicator's observations (ilo_sdmx_api.py:106-139)."""
        params = {
            "format": "csvfile",
            "startPeriod": start_period,
            "endPeriod": end_period,
        } | kwargs
        return self.fetch_csv(
            spark, f"{self.uri}data/ILO,{indicator_code}/", params
        )


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
