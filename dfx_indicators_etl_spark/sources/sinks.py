"""Dataset sinks: versioned parquet layout, partitioned and bucketed writes.

Re-expresses the reference storage layer
(`/root/reference/src/dfx_etl/storage/_base.py:46-112` —
``write_dataset`` writes ``<root>/vYY-MM-DD/<folder>/<name>.parquet``,
``read_dataset`` dispatches on extension; `storage/__init__.py:20-45`
picks local vs Azure from the environment) as Spark writers:

- a *dataset* here is a parquet **directory** (many part-files), the
  scalable layout — writers run distributed, readers parallelize over
  files, and partition columns prune at the scan.
- the Azure backend needs the ``hadoop-azure`` jars + account config;
  like the reference it is selected by environment, and it is stubbed
  out with a clear error when the ABFS connector isn't on the
  classpath (no cloud creds in this harness).
"""

from __future__ import annotations

import os
from datetime import date, datetime, timezone

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "dataset_version",
    "resolve_storage_root",
    "write_dataset",
    "read_dataset",
    "write_partitioned",
    "write_bucketed_table",
]


def dataset_version(as_of: date | None = None) -> str:
    """Version tag ``vYY-MM-DD`` (reference `storage/_base.py:29-38`)."""
    as_of = as_of or datetime.now(timezone.utc).date()
    return as_of.strftime("v%y-%m-%d")


def resolve_storage_root() -> str:
    """Pick the storage root from the environment.

    Mirrors `storage/__init__.py:20-45`: explicit local path wins, else
    an Azure container URI (``abfss://…``) that Spark's Hadoop ABFS
    connector reads natively; error when neither is configured.
    """
    local = os.environ.get("LOCAL_STORAGE_PATH")
    if local:
        return local
    account = os.environ.get("AZURE_STORAGE_ACCOUNT")
    container = os.environ.get("AZURE_STORAGE_CONTAINER")
    if account and container:
        # Requires hadoop-azure on the classpath + auth conf; absent in
        # this harness, so surface the gap explicitly rather than at
        # first task failure.
        raise NotImplementedError(
            "Azure ABFS backend requires the hadoop-azure connector "
            f"(abfss://{container}@{account}.dfs.core.windows.net)"
        )
    raise KeyError(
        "Neither LOCAL_STORAGE_PATH nor AZURE_STORAGE_ACCOUNT/CONTAINER is set."
    )


def write_dataset(
    df: DataFrame,
    root: str,
    name: str,
    folder: str = "",
    version: str | None = None,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> str:
    """Write a versioned parquet dataset; returns its full path.

    Layout matches the reference (`storage/_base.py:46-69`):
    ``<root>/<version>/<folder>/<name>.parquet`` — but as a parquet
    directory, optionally hive-partitioned by ``partition_by`` so a
    reader filtering on those columns prunes whole directories.
    """
    version = version or dataset_version()
    path = "/".join(p for p in (root, version, folder, f"{name}.parquet") if p)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def read_dataset(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Read a dataset back, dispatching on extension.

    Parity with `storage/_base.py:71-112`: ``.parquet`` / bare
    directories / ``.csv`` supported; ``.xlsx`` needs a spreadsheet
    datasource the harness doesn't ship, so it raises like the
    reference's unsupported-extension branch.
    """
    lower = path.lower()
    if lower.endswith((".parquet", "/")) or "." not in os.path.basename(path):
        return spark.read.options(**options).parquet(path)
    if lower.endswith(".csv"):
        return spark.read.options(header="true", **options).csv(path)
    if lower.endswith(".xlsx"):
        raise NotImplementedError(
            "xlsx needs an excel datasource (e.g. spark-excel) on the classpath"
        )
    raise ValueError(f"Unsupported extension for {path!r}")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet write (directory per partition value).

    The scale path for time/category-sliced facts: queries filtering on
    a partition column read only matching directories (partition
    pruning shows as ``PartitionFilters`` in the scan node).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_dataset(
    spark: SparkSession, path: str, target_partitions: int
) -> int:
    """Compact a parquet dataset's small files into ``target_partitions``.

    The maintenance half of streaming/incremental writes: many small
    files destroy scan parallelism economics (one task per tiny file,
    footer overhead dominating). Rewrites via a staging directory then
    swaps — a real deployment gets this atomically from a table format
    (Delta/Iceberg ``OPTIMIZE``); the rewrite plan is identical.
    Returns the file count after compaction.
    """
    import shutil

    staging = f"{path}__compacting"
    spark.read.parquet(path).repartition(target_partitions).write.mode(
        "overwrite"
    ).parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (`saveAsTable`).

    Bucketing is the 100 TB lever for fact–fact joins: two tables
    bucketed on the same key into the same bucket count join with NO
    shuffle (and no sort, when also sorted). Requires the metastore
    catalog, hence ``saveAsTable`` rather than a path write.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
