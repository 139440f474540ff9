"""Source pipelines: Retriever → Transformer → load (SURVEY §1).

``SOURCES`` maps provider names to their (Retriever, Transformer)
classes — the switchboard equivalent of the reference's
``pipelines/__init__`` module registry. Transformers taking a
``country_mapping`` frame receive it at construction (the distributed
stand-in for ``country_converter`` / the UNSD M49 table).
"""

from . import sipri_milex, unstats_sdg_api, who_gho_api, world_bank_api, world_bank_wdi
from .base import BaseRetriever, BaseTransformer, Pipeline, PipelineSettings

SOURCES = {
    "sipri_milex": sipri_milex,
    "unstats_sdg_api": unstats_sdg_api,
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
