"""Query-surface operator catalog.

Each operator module registers named queries via :mod:`registry`; the driver
contract (``__spark_entry__.py``) exposes the union.  Every query is a
callable ``(spark, sf_dir) -> DataFrame`` paired (where SQL-expressible) with
an ANSI-SQL oracle string run by DuckDB over the same parquet tables.
"""

from national_caseload_data_ingest_spark.operators.registry import (
    ORACLES,
    QUERIES,
    query,
)

__all__ = ["ORACLES", "QUERIES", "query"]
