"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.2) at sf0.001;
``queries()`` exposes the full operator library (SURVEY.md §2 inventory +
north-star LLM-pipeline ops); ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for every SQL-expressible query (the rest get rows-only checks).

Implementation lives in ``local_llm_iceberg_cdw_spark/``; this module is a
thin adapter to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's CWD
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from local_llm_iceberg_cdw_spark.operators import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from local_llm_iceberg_cdw_spark.operators.relational import (
        q_flagship_revenue_by_segment,
    )

    return q_flagship_revenue_by_segment(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted → rows-only check."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
