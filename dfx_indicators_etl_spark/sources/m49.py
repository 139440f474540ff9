"""UNSD M49 country-metadata loader.

The reference packages the public UNSD M49 table (semicolon-delimited
CSV, one row per country/area) and exposes dict lookups over it
(`/root/reference/src/dfx_etl/utils.py:28-155` — ``read_data_csv`` /
``get_country_metadata`` / ``replace_country_metadata``; the same table
seeds the ``country`` dim, `database/entities.py:137-160`). The data
file itself is not vendored here — point ``load_m49`` at a downloaded
copy (https://unstats.un.org/unsd/methodology/m49/overview) and every
pipeline's ``country_mapping`` / ``countries`` input and the star
schema's country dim come out of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .readers import read_csv

__all__ = ["M49_RAW_SCHEMA", "load_m49", "m49_country_dim"]

# Column layout of the published UNSD CSV (semicolon-delimited).
M49_RAW_SCHEMA = (
    "`Global Code` string, `Global Name` string, `Region Code` string, "
    "`Region Name` string, `Sub-region Code` string, `Sub-region Name` string, "
    "`Intermediate Region Code` string, `Intermediate Region Name` string, "
    "`Country or Area` string, `M49 Code` string, `ISO-alpha2 Code` string, "
    "`ISO-alpha3 Code` string, "
    "`Least Developed Countries (LDC)` string, "
    "`Land Locked Developing Countries (LLDC)` string, "
    "`Small Island Developing States (SIDS)` string"
)


def load_m49(spark: SparkSession, path: str) -> DataFrame:
    """Read the UNSD M49 CSV into the canonical mapping frame.

    Output columns match what the pipelines and ``database`` expect:
    ``name / m49 / iso_alpha_2 / iso_alpha_3 / region / subregion /
    ldc / lldc / sids``. The x-marks-membership flag columns become
    booleans (utils.py:84-115 reads them the same way).
    """
    raw = read_csv(spark, path, schema=M49_RAW_SCHEMA, sep=";")
    flag = lambda c: F.col(c).isNotNull() & (F.trim(F.col(c)) != "")  # noqa: E731
    return raw.select(
        F.col("Country or Area").alias("name"),
        F.col("M49 Code").cast("int").cast("string").alias("m49"),
        F.col("ISO-alpha2 Code").alias("iso_alpha_2"),
        F.col("ISO-alpha3 Code").alias("iso_alpha_3"),
        F.col("Region Name").alias("region"),
        F.col("Sub-region Name").alias("subregion"),
        flag("Least Developed Countries (LDC)").alias("ldc"),
        flag("Land Locked Developing Countries (LLDC)").alias("lldc"),
        flag("Small Island Developing States (SIDS)").alias("sids"),
    ).filter(F.col("iso_alpha_3").isNotNull())


def m49_country_dim(m49: DataFrame) -> DataFrame:
    """The ``country`` dim table (entities.py:30-47): m49 code as the
    natural primary key, ready for ``database.build_star_schema``."""
    return m49.select(
        F.col("m49").cast("int").alias("id"),
        F.col("iso_alpha_2").alias("iso_2"),
        F.col("iso_alpha_3").alias("iso_3"),
        "name",
        "subregion",
        "region",
        "ldc",
        "lldc",
        "sids",
    )
