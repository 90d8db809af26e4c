#!/usr/bin/env python
"""CLI: scrape a DOJ listing page and load every zip of a dump.

Parity with the reference's ``import_all.py``
(``/root/reference/import_all.py:25-108``), with the download/load overlap
its README promised but never implemented (the reference loops zips
sequentially, ``/root/reference/import_all.py:107-108``): here downloads
run ahead in a thread pool while Spark loads.

Example::

    python import_all.py https://www.justice.gov/usao/resources/... \
        --warehouse /data/warehouse --db ncd
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("listing_url", help="DOJ listing page with .zip links")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--db", default="ncd")
    parser.add_argument("--max-parallel-downloads", type=int, default=4)
    args = parser.parse_args()

    from national_caseload_data_ingest_spark.catalog import SparkCatalog
    from national_caseload_data_ingest_spark.session import get_spark
    from national_caseload_data_ingest_spark.sources.data_zip import NcdZipLoader
    from national_caseload_data_ingest_spark.sources.listing import load_all

    spark = get_spark("import-all")
    catalog = SparkCatalog(spark, args.warehouse, db_name=args.db)
    catalog.create_db()
    loaded = load_all(
        args.listing_url,
        lambda zip_path: NcdZipLoader(spark, catalog, zip_path),
        max_parallel_downloads=args.max_parallel_downloads,
    )
    print(f"loaded {len(loaded)} zips")


if __name__ == "__main__":
    main()
