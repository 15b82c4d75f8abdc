"""Shared column-expression combinators for the operator library.

These exist to keep expensive expression pipelines *narrow* (no shuffle)
without paying Catalyst's CollapseProject recomputation: the optimizer
inlines a projected expression into every downstream reference, so a
hash/signature computed in one ``select`` and consumed N times becomes N
copies of the work.  The classic workaround is a ``repartition`` barrier,
but that trades an O(n) recompute for a full-data exchange — exactly the
wrong trade at 100 TB.

``let`` is the shuffle-free fix: higher-order-function lambda variables
are bound once per row, so wrapping the expensive expression as
``transform(array(e), x -> body)[1]`` gives every reference in ``body``
a true variable reference.  Measured on the winnowing fingerprint op at
sf0.1: 540 s naive (CollapseProject inlining), 8.4 s with repartition
barriers, 0.3 s with ``let`` and zero exchanges.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``expr`` to a lambda variable, evaluated exactly once per row.

    ``body`` may reference its argument any number of times (including
    from nested higher-order lambdas) without re-evaluating ``expr`` —
    a per-row let-binding, spelled with Spark's own HOF machinery:
    ``transform(array(e), x -> body(x))[1]``.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


def bind(df: DataFrame, expr: Column, name: str) -> DataFrame:
    """DataFrame-level let: attach ``expr`` as column ``name``, evaluated
    exactly once per row even when later selects reference it many times.

    ``explode(array(e))`` routes the value through a Generate node, whose
    output is a concrete attribute — CollapseProject cannot inline an
    attribute, so downstream references are plain reads.  Unlike a
    ``repartition`` barrier this is narrow (zero exchange) and unlike
    ``let`` it survives *across* DataFrame operations, including multiple
    output columns of the same select.
    """
    return df.select("*", F.explode(F.array(expr)).alias(name))


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input has fewer splits than cores.

    Local test fixtures arrive as a single parquet split = one task,
    which would serialize any compute-heavy narrow stage; at production
    scale the scan has thousands of splits and this is a no-op, keeping
    the pipeline shuffle-free.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
