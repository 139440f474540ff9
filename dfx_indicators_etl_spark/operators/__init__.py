from .indicator import (
    combine_dimensions,
    dedup_first,
    filter_countries,
    filter_years,
    format_indicator_name,
    insert_ignore,
    map_country_metadata,
    melt,
    snake_case_columns,
    upsert,
)

__all__ = [
    "combine_dimensions",
    "dedup_first",
    "filter_countries",
    "filter_years",
    "format_indicator_name",
    "insert_ignore",
    "map_country_metadata",
    "melt",
    "snake_case_columns",
    "upsert",
]
