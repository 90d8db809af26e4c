"""Fixed-width text → typed, redaction-flagged DataFrame.

The Spark-first replacement for the reference's per-row Python pipeline
(CR-strip → csvkit fixed2csv → dict cast → JSON, SURVEY.md §2.1 A4-A9):
here the whole thing is a single narrow projection over ``spark.read.text``
— substring slicing, redaction, and casts are all ``Column`` expressions
inside one whole-stage-codegen span.  No UDFs, no shuffle, no Python in the
executor hot path; at 100 TB this scales linearly with input splits.

Semantics reproduced (with reference citations):

- ``\r`` is replaced by a **space, not removed**, so column offsets never
  shift (``/root/reference/ncd/normal_table.py:270-291``).
- A cell equal to ``*`` is a DOJ redaction marker: value → NULL and the
  ``redacted_{col}`` shadow BOOLEAN → true
  (``/root/reference/ncd/normal_table.py:200-222``).
- Casts null on failure (``/root/reference/ncd/normal_table.py:109-115``);
  NUMBER additionally accepts only integer text because the reference's
  ``int()`` raises on ``'12.5'`` while Spark's cast would truncate to 12 —
  an integer-regex guard restores parity (SURVEY.md §7 hard part 6).
- Oracle dates ``01-JAN-2017`` parse via ``dd-MMM-yyyy`` under the LEGACY
  parser (``/root/reference/ncd/normal_table.py:105-107``); unparseable
  dates → NULL.
- VARCHAR keeps empty strings as ``''`` (Python ``str()`` never raises), so
  only redaction produces NULL strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.sources.schemas import FieldSpec, TableSchema

_INT_RE = r"^[+-]?[0-9]+$"
REDACTION_MARKER = "*"


def _cast_cell(raw: Column, f: FieldSpec) -> Column:
    """Typed value for one field, null-on-failure, reference semantics."""
    trimmed = F.trim(raw)
    if f.src_type in ("VARCHAR", "VARCHAR2"):
        return trimmed
    if f.src_type == "NUMBER":
        return F.when(trimmed.rlike(_INT_RE), trimmed.cast("bigint"))
    if f.src_type == "DATE":
        return F.to_date(trimmed, "dd-MMM-yyyy")
    if f.src_type == "FLOAT":
        return trimmed.cast("double")
    raise NotImplementedError(f"Unsupported source field type: {f.src_type}")


def project_fixed_width(lines: DataFrame, schema: TableSchema) -> DataFrame:
    """Slice a one-column DataFrame of raw lines into the typed table.

    ``lines`` must have a string column named ``value`` (``spark.read.text``
    contract).  Output columns: all data columns (lower-cased names), then
    all ``redacted_*`` shadows — the reference's DDL order
    (``/root/reference/ncd/normal_table.py:166-175``).
    """
    # Offsets-preserving CR handling (A4).
    value = F.regexp_replace(F.col("value"), "\r", " ")
    cells = {f.name: F.trim(F.substring(value, f.start, f.length)) for f in schema.fields}
    data_cols = []
    shadow_cols = []
    for f in schema.fields:
        raw = cells[f.name]
        is_redacted = raw == REDACTION_MARKER
        data_cols.append(
            F.when(is_redacted, F.lit(None)).otherwise(_cast_cell(raw, f))
            .alias(f.name.lower())
        )
        shadow_cols.append(is_redacted.alias(f"redacted_{f.name.lower()}"))
    return lines.select(*data_cols, *shadow_cols)


def read_fixed_width(
    spark: SparkSession, paths: list[str] | str, schema: TableSchema
) -> DataFrame:
    """``spark.read.text`` over staged (UTF-8) fixed-width files + projection.

    Input staging re-encodes latin-1 → UTF-8 (see ``data_zip.stage_members``);
    latin-1 maps 1 byte ↔ 1 char, so character-based ``substring`` extents
    remain exactly the reference's byte extents.
    """
    return project_fixed_width(spark.read.text(paths), schema)
