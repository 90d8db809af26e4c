#!/usr/bin/env python
"""CLI: load one NCD zip into the Spark catalog.

Parity with the reference's ``import_zip.py`` entry point
(``/root/reference/import_zip.py:20-37``): same inputs (zip path, target
database, storage prefix), Spark-native backend instead of S3+Athena.

Example::

    python import_zip.py data/ncd_dump.zip \
        --warehouse /data/warehouse --db ncd
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("zip_path", help="path to an NCD data zip")
    parser.add_argument(
        "--warehouse",
        required=True,
        help="table storage root (file://, hdfs://, or s3a:// prefix)",
    )
    parser.add_argument("--db", default="ncd", help="target database name")
    parser.add_argument(
        "--fidelity-json",
        action="store_true",
        help="write gzipped JSON-lines (reference byte format) instead of parquet",
    )
    args = parser.parse_args()

    from national_caseload_data_ingest_spark.catalog import SparkCatalog
    from national_caseload_data_ingest_spark.session import get_spark
    from national_caseload_data_ingest_spark.sources.data_zip import NcdZipLoader

    spark = get_spark("import-zip")
    catalog = SparkCatalog(
        spark, args.warehouse, db_name=args.db, fidelity_json=args.fidelity_json
    )
    catalog.create_db()
    loaded = NcdZipLoader(spark, catalog, args.zip_path).load()
    print(f"loaded {len(loaded)} tables: {', '.join(loaded)}")


if __name__ == "__main__":
    main()
