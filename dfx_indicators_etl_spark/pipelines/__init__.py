"""Source pipelines: Retriever → Transformer → load (SURVEY §1).

``SOURCES`` maps provider names to their (Retriever, Transformer)
classes — the switchboard equivalent of the reference's
``pipelines/__init__`` module registry. Transformers taking a
``country_mapping`` frame receive it at construction (the distributed
stand-in for ``country_converter`` / the UNSD M49 table).
"""

from . import (
    energydata_info,
    healthdata_ghdx,
    ilo_sdmx_api,
    imf_datamapper_api,
    sipri_milex,
    unaids_kpatlas,
    unicef_sdmx_api,
    unstats_sdg_api,
    unstats_sdg_database,
    who_gho_api,
    world_bank_api,
    world_bank_wdi,
)
from .base import BaseRetriever, BaseTransformer, Pipeline, PipelineSettings

SOURCES = {
    "energydata_info": energydata_info,
    "healthdata_ghdx": healthdata_ghdx,
    "ilo_sdmx_api": ilo_sdmx_api,
    "imf_datamapper_api": imf_datamapper_api,
    "sipri_milex": sipri_milex,
    "unaids_kpatlas": unaids_kpatlas,
    "unicef_sdmx_api": unicef_sdmx_api,
    "unstats_sdg_api": unstats_sdg_api,
    "unstats_sdg_database": unstats_sdg_database,
    "who_gho_api": who_gho_api,
    "world_bank_api": world_bank_api,
    "world_bank_wdi": world_bank_wdi,
}

__all__ = [
    "BaseRetriever",
    "BaseTransformer",
    "Pipeline",
    "PipelineSettings",
    "SOURCES",
]
