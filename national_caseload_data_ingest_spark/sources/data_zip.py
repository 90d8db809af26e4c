"""NCD zip archive source + per-zip load orchestration.

Spark-first re-expression of the reference's ``DataZip`` pipeline
(``/root/reference/ncd/data_zip.py:40-52``):

1. Stage zip members to a scratch directory, re-encoding latin-1 → UTF-8
   and replacing ``\\r`` with a space (offset-preserving, like the
   reference's chunked CR-strip at ``/root/reference/ncd/
   normal_table.py:270-291``).  Zip members are not splittable, so
   extraction is driver-side; once staged, *all district files of a table
   are read by one* ``spark.read.text`` *call* and processed in parallel —
   the reference loops districts sequentially
   (``/root/reference/ncd/normal_table.py:51-60``).
2. Extract normal-table schemas from ``README.TXT`` (latin-1,
   ``/root/reference/ncd/data_zip.py:104-105``).
3. For each normal table (sorted, A25): discover member files
   ``{table}(_{DISTRICT})?.txt`` (``/root/reference/ncd/
   normal_table.py:233-235``), project fixed-width → typed + redaction
   shadows, attach ``filename_district`` from the *file name* (via
   ``input_file_name()``, so a single distributed read covers every
   district), and write through the catalog; ``is_partitioned`` iff every
   file carried a district suffix (``/root/reference/ncd/normal_table.py:62``).
4. Global tables (UTF-8 stacked file; silent no-op when absent) and lookup
   tables (``table_gs_*`` members, latin-1, sorted) land unpartitioned.

At 100 TB the unit of parallelism is the file: a monthly dump is ~24 zips ×
~94 districts × ~40 tables of members, which comfortably saturates a
1000-executor cluster once staged (staging itself parallelizes across zips —
see ``import_all``-equivalent in ``sources/listing.py``).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import zipfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.catalog import (
    PARTITION_COLUMN,
    SparkCatalog,
)
from national_caseload_data_ingest_spark.sources import globals as g
from national_caseload_data_ingest_spark.sources.fixedwidth import (
    project_fixed_width,
)
from national_caseload_data_ingest_spark.sources.schemas import (
    TableSchema,
    extract_normal_schemas,
)

README_MEMBER = "README.TXT"


def district_file_pattern(table_name: str) -> re.Pattern[str]:
    """``{table_lower}(_{DISTRICT})?.txt`` member matcher
    (``/root/reference/ncd/normal_table.py:233-235``)."""
    return re.compile(
        rf"^{re.escape(table_name.lower())}(?:_(?P<district>[A-Z]+))?\.txt$"
    )


@dataclass
class StagedZip:
    """Zip members staged to a scratch dir as UTF-8, CR-stripped text."""

    stage_dir: str
    members: dict[str, str] = field(default_factory=dict)  # member -> path
    owns_dir: bool = False

    def cleanup(self) -> None:
        if self.owns_dir:
            shutil.rmtree(self.stage_dir, ignore_errors=True)


def stage_members(
    zip_path: str,
    stage_dir: str | None = None,
    encoding: str = "latin-1",
) -> StagedZip:
    """Extract every ``.txt`` member, re-encoded to UTF-8 with ``\\r``→space.

    latin-1 maps each byte to one char, so fixed-width character extents are
    preserved; the CR replacement keeps offsets intact exactly like the
    reference (space, not removal).  ``global_LIONS.txt`` is already UTF-8
    (``/root/reference/ncd/global_file.py:223``) and staged verbatim.
    """
    owns = stage_dir is None
    stage_dir = stage_dir or tempfile.mkdtemp(prefix="ncd_stage_")
    os.makedirs(stage_dir, exist_ok=True)
    staged = StagedZip(stage_dir=stage_dir, owns_dir=owns)
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            if member.endswith("/"):
                continue
            raw = zf.read(member)
            member_enc = "utf-8" if member == g.GLOBAL_MEMBER_NAME else encoding
            text = raw.replace(b"\r", b" ").decode(member_enc)
            out_path = os.path.join(stage_dir, member.replace("/", "__"))
            with open(out_path, "w", encoding="utf-8") as fh:
                fh.write(text)
            staged.members[member] = out_path
    return staged


class NcdZipLoader:
    """Load one NCD zip into the catalog (the reference's ``DataZip.load``)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: SparkCatalog,
        zip_path: str,
        stage_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.zip_path = zip_path
        self.stage_dir = stage_dir

    def load(self) -> list[str]:
        """Process normal, global, then lookup tables; returns table names."""
        staged = stage_members(self.zip_path, self.stage_dir)
        loaded: list[str] = []
        try:
            schemas = self._normal_schemas(staged)
            for name in sorted(schemas):
                self._load_normal_table(staged, schemas[name])
                loaded.append(name)
            loaded += self._load_global_tables(staged)
            loaded += self._load_lookup_tables(staged)
        finally:
            staged.cleanup()
        return loaded

    # -- normal tables -----------------------------------------------------

    def _normal_schemas(self, staged: StagedZip) -> dict[str, TableSchema]:
        readme = staged.members.get(README_MEMBER)
        if readme is None:
            return {}
        with open(readme, encoding="utf-8") as fh:
            return extract_normal_schemas(fh.read())

    def read_normal_table(
        self, staged: StagedZip, schema: TableSchema
    ) -> tuple[DataFrame, bool] | None:
        """One distributed read over every district file of a table.

        Returns ``(df, is_partitioned)`` — df carries ``filename_district``
        extracted from each row's source file name, NULL for the
        all-districts (unsuffixed) file.
        """
        pattern = district_file_pattern(schema.name)
        files = {
            m.group("district"): path
            for member, path in staged.members.items()
            if (m := pattern.match(member))
        }
        if not files:
            return None
        is_partitioned = None not in files
        lines = self.spark.read.text(sorted(files.values()))
        df = project_fixed_width(lines, schema).withColumn(
            PARTITION_COLUMN,
            F.regexp_extract(
                F.input_file_name(), r"_([A-Z]+)\.txt$", 1
            ),
        )
        # Unsuffixed file → empty extract → NULL district (reference key None)
        df = df.withColumn(
            PARTITION_COLUMN,
            F.when(F.col(PARTITION_COLUMN) == "", None).otherwise(
                F.col(PARTITION_COLUMN)
            ),
        )
        return df, is_partitioned

    def _load_normal_table(self, staged: StagedZip, schema: TableSchema) -> None:
        result = self.read_normal_table(staged, schema)
        if result is None:
            return
        df, is_partitioned = result
        if not is_partitioned:
            df = df.drop(PARTITION_COLUMN)
        self.catalog.write_table(
            schema.name.lower(), df, partitioned=is_partitioned
        )

    # -- global + lookup tables --------------------------------------------

    def _load_global_tables(self, staged: StagedZip) -> list[str]:
        path = staged.members.get(g.GLOBAL_MEMBER_NAME)
        if path is None:
            return []  # silent no-op, reference parity
        with open(path, encoding="utf-8") as fh:
            content = fh.read()
        loaded = []
        for name, df in sorted(g.read_global_tables(self.spark, content).items()):
            self.catalog.write_table(name.lower(), df)
            loaded.append(name)
        return loaded

    def _load_lookup_tables(self, staged: StagedZip) -> list[str]:
        loaded = []
        for member in sorted(staged.members):
            if not member.startswith(g.LOOKUP_MEMBER_PREFIX):
                continue
            with open(staged.members[member], encoding="utf-8") as fh:
                content = fh.read()
            name, df = g.read_lookup_table(self.spark, content)
            self.catalog.write_table(name.lower(), df)
            loaded.append(name)
        return loaded


def read_zip_member_lines(
    spark: SparkSession,
    zip_paths: list[str],
    member_pattern: str = r".*\.txt$",
    encoding: str = "latin-1",
) -> DataFrame:
    """Cluster-mode zip source: read matching members of many zips WITHOUT
    driver-side staging — ``(zip_path, member, line)`` rows.

    Zip members are not splittable, so the unit of parallelism is the
    archive: ``binaryFiles`` ships each zip's bytes to one executor, which
    unzips, CR-strips (offset-preserving space, like :func:`stage_members`)
    and decodes there.  A monthly dump's ~24 zips fan out to 24 tasks; a
    year of dumps saturates a mid-size cluster with zero driver IO.  Use
    this path when archives live on object storage and the driver-staging
    path (:func:`stage_members`) would bottleneck; downstream fixed-width
    projection is identical (`filename_district` comes from ``member``
    instead of the staged file name).

    Memory: one archive's *compressed* bytes must fit in one executor task
    (NCD zips are ~100 MB); members decompress streamingly per line.
    """
    import re as _re  # noqa: PLC0415

    pat = _re.compile(member_pattern)

    def explode_zip(kv):  # pragma: no cover - runs on executors
        import io  # noqa: PLC0415
        import zipfile as _zf  # noqa: PLC0415

        path, pds = kv
        with _zf.ZipFile(io.BytesIO(bytes(pds))) as zf:
            for member in sorted(zf.namelist()):
                if member.endswith("/") or not pat.match(member):
                    continue
                member_enc = (
                    "utf-8" if member == g.GLOBAL_MEMBER_NAME else encoding
                )
                with zf.open(member) as fh:
                    for raw in fh:
                        yield (
                            path,
                            member,
                            raw.rstrip(b"\n")
                            .replace(b"\r", b" ")
                            .decode(member_enc),
                        )

    rdd = spark.sparkContext.binaryFiles(",".join(zip_paths)).flatMap(explode_zip)
    return spark.createDataFrame(rdd, schema="zip_path string, member string, value string")
