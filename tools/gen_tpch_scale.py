"""Generate TPC-H tables at an arbitrary SF for scaling probes — the
relational/graph counterpart of ``gen_scale_slice.py`` (VERDICT r16
stretch #10: the graph family + record_linkage_blocked need
supplier/part/orders/lineitem/customer a decade up, which the driver's
read-only testdata tops out of at sf0.1).

DuckDB's offline ``tpch`` extension does the generation; columns are
cast/renamed to the driver's exact parquet schemas (TESTDATA.md), so
``catalog.load_table`` reads the probe dirs unchanged.  For a CLEAN
decade, generate BOTH ends with this tool (dbgen sf0.1 vs dbgen sf1) —
mixing the driver's own sf0.1 files with dbgen sf1 would confound the
exponent with generator-distribution drift.

Usage::

    python tools/gen_tpch_scale.py /tmp/scale_tpch01 0.1
    python tools/gen_tpch_scale.py /tmp/scale_tpch10 1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

# driver-schema casts (TESTDATA.md): decimals → double, date → timestamp,
# keys at the driver's widths; unlisted dbgen columns are dropped
_TABLES = {
    "region": "SELECT CAST(r_regionkey AS INT) r_regionkey, r_name FROM region",
    "nation": (
        "SELECT CAST(n_nationkey AS INT) n_nationkey, n_name, "
        "CAST(n_regionkey AS INT) n_regionkey FROM nation"
    ),
    "customer": (
        "SELECT c_custkey, c_name, CAST(c_nationkey AS INT) c_nationkey, "
        "CAST(c_acctbal AS DOUBLE) c_acctbal, c_mktsegment FROM customer"
    ),
    "supplier": (
        "SELECT s_suppkey, s_name, CAST(s_nationkey AS INT) s_nationkey, "
        "CAST(s_acctbal AS DOUBLE) s_acctbal FROM supplier"
    ),
    "part": (
        "SELECT p_partkey, p_name, p_brand, p_type, CAST(p_size AS INT) p_size, "
        "CAST(p_retailprice AS DOUBLE) p_retailprice FROM part"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, "
        "CAST(o_totalprice AS DOUBLE) o_totalprice, "
        "CAST(o_orderdate AS TIMESTAMP) o_orderdate, o_orderpriority FROM orders"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, CAST(l_linenumber AS INT) "
        "l_linenumber, CAST(l_quantity AS DOUBLE) l_quantity, "
        "CAST(l_extendedprice AS DOUBLE) l_extendedprice, "
        "CAST(l_discount AS DOUBLE) l_discount, CAST(l_tax AS DOUBLE) l_tax, "
        "l_returnflag, l_linestatus, CAST(l_shipdate AS TIMESTAMP) l_shipdate "
        "FROM lineitem"
    ),
}


def main(out_dir: str, sf: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    con.execute(f"CALL dbgen(sf={sf})")
    for name, sql in _TABLES.items():
        dest = os.path.join(out_dir, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n} rows -> {dest}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
