"""Skew-resilient join utilities.

AQE's skew-join split handles most skew at runtime (enabled in
``session.py``); salting is the explicit fallback for pathological keys
or for engines/stages AQE can't re-plan (e.g., inside a streaming join).

``salted_join``: replicate the small side SALT_N times and scatter the
big side's hot keys uniformly across the replicas — the classic
shuffle-key decomposition.  Result is row-identical to the plain join
(property-tested); cost is SALT_N× the small side's shuffle volume, which
is the right trade when one key holds 1% of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_N = 8

# Join types for which replicating the small side is row-identical to the
# plain join.  For right/full outer joins, an unmatched small-side row would
# surface once per replica (salt_n copies) — reject those rather than
# silently multiply rows.
_SALTED_JOIN_HOWS = frozenset(
    {"inner", "cross", "left", "leftouter", "left_outer", "semi", "leftsemi",
     "left_semi", "anti", "leftanti", "left_anti"}
)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = DEFAULT_SALT_N,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, salted against hot keys in `big`.

    The salt is derived deterministically from a stable hash of the full
    big-side row via ``xxhash64`` (not ``rand()`` — keeps runs and
    retried tasks bit-identical, which matters for exactly-once sinks).

    ``how`` is restricted to the big-side-preserving family (inner/left/
    semi/anti): right/full outer joins would emit each unmatched
    small-side row once per replica.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALTED_JOIN_HOWS}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, not {how!r}: "
            f"unmatched small-side rows would appear {salt_n}× (one per replica)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    big_salted = big.withColumn("_salt", salt.cast("int"))
    replicas = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return big_salted.join(replicas, [key, "_salt"], how).drop("_salt")
