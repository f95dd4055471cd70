"""Dataset catalog helpers — load_dataset / list_datasets semantics
(/root/reference/sequenzo/datasets/__init__.py:13-34) over a parquet
directory or the Spark catalog.

The reference bundles named CSVs; here a "catalog" is either a directory of
parquet tables (the driver's testdata layout) or the session catalog
(`spark.catalog.listTables`) when tables are registered.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def list_datasets(spark: SparkSession, root: str | None = None) -> list[str]:
    """Names available to :func:`load_dataset`. With ``root``: the parquet
    table dirs/files under it (driver-listing only — no Spark job). Without:
    the current catalog's tables."""
    if root is not None:
        out = set()
        for e in os.listdir(root):
            if e.endswith(".parquet"):
                out.add(e[: -len(".parquet")])
            elif os.path.isdir(os.path.join(root, e)) and not e.startswith("_"):
                out.add(e)
        return sorted(out)
    return sorted(t.name for t in spark.catalog.listTables())


def load_dataset(spark: SparkSession, name: str, root: str) -> DataFrame:
    """Read one named table from a parquet catalog root (lazily — the scan
    plan only; Catalyst prunes columns/partitions per downstream query)."""
    for cand in (f"{root}/{name}.parquet", f"{root}/{name}"):
        if os.path.exists(cand):
            return spark.read.parquet(cand)
    raise FileNotFoundError(
        f"dataset {name!r} not found under {root}; "
        f"available: {list_datasets(spark, root)}"
    )
