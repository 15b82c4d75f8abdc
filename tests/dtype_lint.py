"""Oracle/engine output-dtype lint helpers.

Round-8 post-mortem: ``curriculum_stages`` was hash-red for three rounds
because its oracle ended in a bare ``sum(BIGINT)``, which DuckDB types as
HUGEINT (int128) — the driver's value hash is dtype-aware, so identical
values still mismatched.  The local parity harness compared Python
``fetchall`` values (where ``int128 == int``) and could never catch it.

This module maps both engines' type names onto hash-equivalence classes
so the parity test can assert a 1:1 dtype correspondence per column.
Classes are exactly as coarse as the driver's canonicalization has been
observed to tolerate (all 154 non-HUGEINT rows were green in r8 with the
pooling below) and no coarser: HUGEINT maps to its own never-allowed
class, and decimals keep their exact (precision, scale).
"""

from __future__ import annotations

_INTS = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
# float32 gets its OWN class: the observed-tolerance claim behind pooling
# was validated on rows that emitted no FLOAT column, so a genuine
# float32-vs-float64 driver-hash mismatch would otherwise pass the local
# lint unvalidated — the same blind-spot pattern that let HUGEINT
# through.  Pool FLOAT/REAL with DOUBLE only after a FLOAT column is
# actually observed to hash-match DOUBLE in a driver round.
_FLOATS32 = {"float", "real"}
_FLOATS = {"double"}
_STRS = {"varchar", "string"}


def dtype_class(type_name: str) -> str:
    """Normalize a DuckDB or Spark type string to a hash-equivalence class."""
    t = type_name.strip().lower()
    if t.startswith("decimal"):
        return "decimal" + t[len("decimal"):].replace(" ", "")
    if t in _INTS:
        return "int64"
    if t in ("hugeint", "int128", "uhugeint"):
        return "INT128-NEVER-ALLOWED"
    if t in _FLOATS32:
        return "float32"
    if t in _FLOATS:
        return "float64"
    if t in _STRS:
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t in ("boolean", "bool"):
        return "bool"
    if t == "blob" or t == "binary":
        return "binary"
    if t.endswith("[]"):  # DuckDB list
        return f"array<{dtype_class(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):  # Spark array
        return f"array<{dtype_class(t[6:-1])}>"
    return f"other:{t}"


def dtype_mismatches(duck_types: dict[str, str], spark_types: dict[str, str]):
    """Per-column class mismatches between oracle and Spark output.

    Returns ``{col: (duck_type, spark_type)}`` for every oracle column whose
    class differs from (or is missing in) the Spark schema, plus any column
    whose class is the never-allowed int128.
    """
    bad: dict[str, tuple[str, str]] = {}
    for col, dt in duck_types.items():
        st = spark_types.get(col)
        dc = dtype_class(dt)
        sc = dtype_class(st) if st is not None else "<missing>"
        if dc != sc or "INT128" in dc or "INT128" in sc:
            bad[col] = (dt, st if st is not None else "<missing>")
    return bad
