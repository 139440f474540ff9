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
from .base import (
    BaseRetriever,
    BaseTransformer,
    Pipeline,
    PipelineSettings,
    union_all,
)

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
    "list_pipelines",
    "get_pipeline",
    "run_all",
    "union_all",
]


def list_pipelines() -> list[str]:
    """Available pipeline names (reference
    `pipelines/__init__.py:14-27`)."""
    return sorted(SOURCES)


def get_pipeline(
    name: str,
    country_mapping=None,
    storage_root: str | None = None,
    countries=None,
    country_key: str = "iso_alpha_3",
    settings: PipelineSettings | None = None,
    **transformer_kwargs,
) -> Pipeline:
    """Runnable pipeline instance (reference
    `pipelines/__init__.py:30-57`).

    Transformers whose constructor needs the country-mapping frame (the
    distributed stand-in for ``country_converter`` / the UNSD M49
    table) receive ``country_mapping``; the rest take only their own
    ``transformer_kwargs`` (e.g. the ILO codelists).
    """
    import inspect

    if name not in SOURCES:
        raise ValueError(
            f"Pipeline '{name}' does not exist. "
            f"Available pipelines: {list_pipelines()}"
        )
    module = SOURCES[name]
    params = inspect.signature(module.Transformer.__init__).parameters
    if "country_mapping" in params:
        transformer_kwargs.setdefault("country_mapping", country_mapping)
    return Pipeline(
        retriever=module.Retriever(),
        transformer=module.Transformer(**transformer_kwargs),
        storage_root=storage_root,
        countries=countries,
        country_key=country_key,
        settings=settings or PipelineSettings(),
    )


def run_all(
    spark,
    inputs: dict[str, dict],
    storage_root: str,
    country_mapping=None,
    countries=None,
    country_key: str = "iso_alpha_3",
    settings: PipelineSettings | None = None,
) -> dict:
    """The reference's etl.ipynb loop over every configured source:
    retrieve → transform (+M49 filter +year cut) → versioned load, one
    pipeline per ``inputs`` key. ``inputs[name]`` holds the retriever
    kwargs (a pre-staged ``payload`` frame, a ``path``, or nothing for
    live-HTTP retrievers). Returns ``{name: transformed DataFrame}``;
    each source also lands under
    ``<storage_root>/<version>/<name>.parquet``.

    Per-source work is independent, but retrieval here is sequential
    driver control flow like the notebook — the heavy lifting (each
    transform + write) is already distributed, and at scale pipelines
    are scheduled as separate jobs anyway.
    """
    results = {}
    for name, kwargs in inputs.items():
        pipeline = get_pipeline(
            name,
            country_mapping=country_mapping,
            storage_root=storage_root,
            countries=countries,
            country_key=country_key,
            settings=settings,
        )
        results[name] = pipeline.run(spark, **kwargs)
    return results
