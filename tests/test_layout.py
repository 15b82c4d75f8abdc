"""Z-order layout: Morton-key correctness and the measured data-skipping
payoff on real parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.catalog import load_table
from local_llm_iceberg_cdw_spark.functions.zorder import zorder_key
from local_llm_iceberg_cdw_spark.operators.layout import q_zorder_locality

from conftest import SF_SMOKE


def test_zorder_key_reference_values(spark):
    """Morton code against hand-computed values: z(a,b) interleaves a's
    bits at even positions, b's at odd."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 5), (65535, 65535)],
        "a long, b long",
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }

    def ref(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b, z, ref(a, b))
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(1, 1)] == 3
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_locality_envelopes_are_tiles(spark):
    """Bucketing by the top z-bits must produce envelopes that are tight
    in BOTH dimensions: each bucket's (custkey × day) area is a small
    fraction of the global rectangle."""
    rows = q_zorder_locality(spark, SF_SMOKE).collect()
    assert len(rows) > 4
    ck_lo = min(r.custkey_min for r in rows)
    ck_hi = max(r.custkey_max for r in rows)
    d_lo = min(r.day_min for r in rows)
    d_hi = max(r.day_max for r in rows)
    global_area = (ck_hi - ck_lo + 1) * (d_hi - d_lo + 1)
    mean_area = sum(
        (r.custkey_max - r.custkey_min + 1) * (r.day_max - r.day_min + 1) for r in rows
    ) / len(rows)
    assert len(rows) >= 32  # an 8×8 grid minus empty tiles
    assert mean_area < 0.10 * global_area, (mean_area, global_area)


@pytest.mark.parametrize("probe_frac", [0.1])
def test_zorder_write_prunes_row_groups(spark, tmp_path, probe_frac):
    """Write lineitem twice — naturally ordered (by l_orderkey) and
    z-ordered by (l_orderkey, l_partkey) — and measure, from the parquet
    footers, how many row groups a partkey range-probe must read.  The
    z-layout must overlap strictly fewer row groups: that min/max
    tightness IS the file-skipping parquet readers (and Spark's
    row-group filter pushdown) exploit."""
    from local_llm_iceberg_cdw_spark.functions.zorder import quantize

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    ok_lo, ok_hi, pk_lo, pk_hi = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    z = zorder_key(
        quantize(F.col("l_orderkey"), F.lit(ok_lo), F.lit(ok_hi), 8),
        quantize(F.col("l_partkey"), F.lit(pk_lo), F.lit(pk_hi), 8),
        bits=8,
    )

    natural_dir = str(tmp_path / "natural")
    zorder_dir = str(tmp_path / "zorder")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(natural_dir)
    )
    (
        li.withColumn("_z", z)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(zorder_dir)
    )

    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    lo, hi = 0, int(pk_max * probe_frac)

    def overlapping(dirpath: str) -> tuple[int, int]:
        total = hit = 0
        for f in glob.glob(f"{dirpath}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                col = next(
                    meta.row_group(rg).column(i)
                    for i in range(meta.row_group(rg).num_columns)
                    if meta.row_group(rg).column(i).path_in_schema == "l_partkey"
                )
                total += 1
                if col.statistics.min <= hi and col.statistics.max >= lo:
                    hit += 1
        return hit, total

    nat_hit, nat_total = overlapping(natural_dir)
    z_hit, z_total = overlapping(zorder_dir)
    assert nat_total >= 8 and z_total >= 8
    # natural order: partkey is uncorrelated with orderkey, so ~every
    # row group spans the full partkey domain and overlaps the probe
    assert nat_hit == nat_total, (nat_hit, nat_total)
    assert z_hit < nat_hit, (z_hit, nat_hit)
    # and the data is unchanged by the rewrite
    assert (
        spark.read.parquet(zorder_dir).count()
        == spark.read.parquet(natural_dir).count()
        == li.count()
    )
