"""Operator library — the judged query surface.

Each module exposes ``QUERIES: dict[str, QuerySpec]``.  A ``QuerySpec``
bundles the Spark builder ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle (``None`` for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

``all_queries()`` merges every module's registry; ``__spark_entry__.py``
re-exports it in the driver's contract shape.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        curation,
        dedup,
        events,
        multimodal,
        python_udf,
        relational,
        relational_ext,
        similarity,
        snapshots_op,
        text,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational_ext,
        events,
        text,
        dedup,
        similarity,
        curation,
        multimodal,
        python_udf,
        snapshots_op,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
