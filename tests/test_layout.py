"""Physical-layout utilities: range clustering (min/max skipping) and
small-file compaction — the table-maintenance half of 100 TB operability."""

import glob
import os

import pyarrow.parquet as pq

from national_caseload_data_ingest_spark.catalog import local_catalog
from national_caseload_data_ingest_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def test_range_clustered_files_have_disjoint_ranges(spark, tmp_path):
    """Every output file owns a disjoint o_orderkey range, so a range
    predicate can skip whole files on parquet stats — and the data
    round-trips losslessly."""
    cat = local_catalog(spark, str(tmp_path), db_name="layout_db")
    orders = load_tables(spark, SF, "orders")["orders"]
    loc = cat.write_range_clustered("orders_rc", orders, ["o_orderkey"], 8)
    local = loc.removeprefix("file://")
    ranges = []
    for f in sorted(glob.glob(os.path.join(local, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("o_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 4  # actually split into multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    got = spark.read.parquet(loc)
    assert got.count() == orders.count()


def test_compact_table_reduces_files_losslessly(spark, tmp_path):
    cat = local_catalog(spark, str(tmp_path), db_name="layout_db2")
    orders = load_tables(spark, SF, "orders")["orders"]
    loc = cat.table_location("orders_many")
    orders.repartition(24).write.mode("overwrite").parquet(loc)
    local = loc.removeprefix("file://")
    before = len(glob.glob(os.path.join(local, "*.parquet")))
    assert before >= 24
    want = sorted(tuple(r) for r in spark.read.parquet(loc).collect())
    n_files = cat.compact_table("orders_many")
    after = len(glob.glob(os.path.join(local, "*.parquet")))
    assert after == n_files < before
    got = sorted(tuple(r) for r in spark.read.parquet(loc).collect())
    assert got == want
