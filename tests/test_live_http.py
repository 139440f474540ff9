"""World Bank API retrieval: mocked paging (always runs) and a live
HTTP integration path behind an explicit opt-in flag.

The sandbox has neither an HTTP client nor network, so the live leg —
the reference's primary retrieval mode (`pipelines/_base.py:34-120`) —
is exercised only when ``SPARK_GRAFT_LIVE_HTTP=1`` and ``httpx`` is
importable; the pagination/schema logic itself is covered offline via
a stubbed ``fetch_json``.
"""

from __future__ import annotations

import os

import pytest

from dfx_indicators_etl_spark.pipelines import base, world_bank_api


def _fake_pages(n_pages: int, rows_per_page: int):
    def fetch(url, params=None):
        page = params["page"]
        rows = [
            {
                "indicator": {"id": "SP.POP.TOTL", "value": "Population, total"},
                "country": {"id": "US", "value": "United States"},
                "countryiso3code": "USA",
                "date": str(2000 + (page - 1) * rows_per_page + i),
                "value": 1_000_000 + i,  # int on the wire, double in schema
            }
            for i in range(rows_per_page)
        ]
        return [{"pages": n_pages, "page": page}, rows]

    return fetch


def test_world_bank_retriever_paginates(spark, monkeypatch):
    r = world_bank_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_pages(3, 4))
    raw = r(spark)
    assert raw.count() == 12  # all 3 pages drained
    assert dict(raw.dtypes)["value"] == "double"
    assert raw.schema["indicator"].dataType.fieldNames() == ["id", "value"]


def test_world_bank_retriever_bounds_pagination(spark, monkeypatch):
    r = world_bank_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_pages(1000, 2))
    raw = r(spark, max_pages=5)
    assert raw.count() == 10  # runaway pagination cut at max_pages


def test_world_bank_mocked_rows_flow_through_transformer(spark, monkeypatch):
    r = world_bank_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_pages(1, 3))
    mapping = spark.createDataFrame(
        [("United States", 840, "USA")], ["name", "m49", "iso_alpha_3"]
    )
    out = world_bank_api.Transformer(mapping).transform(r(spark))
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["indicator_name"] == "Population, total [SP.POP.TOTL]"
    assert {r["country_code"] for r in rows} == {"USA"}


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LIVE_HTTP") != "1" or base.httpx is None,
    reason="live HTTP is opt-in: SPARK_GRAFT_LIVE_HTTP=1 with httpx + network",
)
def test_world_bank_live_retrieve_and_transform(spark):
    raw = world_bank_api.Retriever()(spark, per_page=500, max_pages=2)
    assert raw.count() > 0
    mapping = spark.createDataFrame(
        [("United States", 840, "USA"), ("India", 356, "IND")],
        ["name", "m49", "iso_alpha_3"],
    )
    out = world_bank_api.Transformer(mapping).transform(raw)
    assert {"indicator_name", "country_code", "year", "value"} <= set(out.columns)
    assert out.count() > 0


# --- WHO GHO OData retrieval (mocked; same opt-in live pattern) ---------


def _fake_gho(n_pages: int, rows_per_page: int):
    calls = {"n": 0}

    def fetch(url, params=None):
        if url.endswith("/Indicator"):
            return {"value": [{"IndicatorCode": "WHOSIS_000001",
                               "IndicatorName": "Life expectancy at birth"}]}
        calls["n"] += 1
        page = calls["n"]
        rows = [
            {
                "SpatialDim": "FRA",
                "TimeDim": 2000 + (page - 1) * rows_per_page + i,
                "Dim1Type": "SEX",
                "Dim1": "SEX_FMLE",
                "DataSourceDim": "DATASOURCE_A",
                "NumericValue": 80 + i,
            }
            for i in range(rows_per_page)
        ]
        out = {"value": rows}
        if page < n_pages:
            out["@odata.nextLink"] = f"https://example/api/page{page + 1}"
        return out

    return fetch


def test_who_gho_retriever_follows_odata_continuations(spark, monkeypatch):
    from dfx_indicators_etl_spark.pipelines import who_gho_api

    r = who_gho_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_gho(3, 2))
    raw = r(spark)
    assert raw.count() == 6  # all 3 OData pages drained
    first = raw.orderBy("TimeDim").first()
    assert first["indicator_name"] == "Life expectancy at birth"
    assert dict(raw.dtypes)["NumericValue"] == "double"


def test_who_gho_retriever_bounds_continuations(spark, monkeypatch):
    from dfx_indicators_etl_spark.pipelines import who_gho_api

    r = who_gho_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_gho(1000, 1))
    assert r(spark, max_pages=4).count() == 4


def test_who_gho_mocked_rows_flow_through_transformer(spark, monkeypatch):
    from pyspark.sql import functions as F

    from dfx_indicators_etl_spark.pipelines import who_gho_api

    r = who_gho_api.Retriever()
    monkeypatch.setattr(r, "fetch_json", _fake_gho(1, 2))
    out = who_gho_api.Transformer().transform(r(spark))
    rows = out.collect()
    assert len(rows) == 2
    assert {x["country_code"] for x in rows} == {"FRA"}
    assert all(x["dimension"] == "FMLE; A" for x in rows)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LIVE_HTTP") != "1" or base.httpx is None,
    reason="live HTTP is opt-in: SPARK_GRAFT_LIVE_HTTP=1 with httpx + network",
)
def test_who_gho_live_retrieve_and_transform(spark):
    from dfx_indicators_etl_spark.pipelines import who_gho_api

    raw = who_gho_api.Retriever()(spark, max_pages=2)
    assert raw.count() > 0
    out = who_gho_api.Transformer().transform(raw)
    assert {"indicator_name", "country_code", "year", "dimension", "value"} <= set(
        out.columns
    )
    assert out.count() > 0


# --- SIPRI workbook download (mocked bytes; same opt-in live pattern) ----


def _sipri_bytes(tmp_path):
    from dfx_indicators_etl_spark.pipelines import sipri_milex
    from dfx_indicators_etl_spark.sources import xlsx

    path = str(tmp_path / "sipri_dl.xlsx")
    preamble = [["SIPRI Military Expenditure Database"]]
    sheets = {
        sheet: preamble
        + [
            ["Country", "Notes", "2019", "2020"],
            ["France", None, 100.0 + i, "xxx"],
            ["Germany", "note", "...", 200.0 + i],
        ]
        for i, sheet in enumerate(sipri_milex.METADATA)
    }
    xlsx.write_xlsx(path, sheets)
    with open(path, "rb") as f:
        return f.read()


def test_sipri_retriever_downloads_and_parses(spark, monkeypatch, tmp_path):
    """The live path: workbook BYTES arrive over HTTP, stage to a temp
    file, and parse through the OOXML reader — identical output to the
    path= route."""
    from dfx_indicators_etl_spark.pipelines import sipri_milex

    data = _sipri_bytes(tmp_path)
    r = sipri_milex.Retriever()
    monkeypatch.setattr(r, "fetch_bytes", lambda url: data)
    raw = r(spark)
    assert raw.columns == ["Country", "indicator_name", "2019", "2020"]
    assert raw.count() == 2 * len(sipri_milex.METADATA)
    fr = raw.filter("Country = 'France'").collect()
    assert all(row["2020"] is None for row in fr)  # sentinels nulled


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LIVE_HTTP") != "1" or base.httpx is None,
    reason="live HTTP is opt-in: SPARK_GRAFT_LIVE_HTTP=1 with httpx + network",
)
def test_sipri_live_download(spark):
    from dfx_indicators_etl_spark.pipelines import sipri_milex

    raw = sipri_milex.Retriever()(spark)
    assert raw.count() > 0 and "Country" in raw.columns
