"""Fixed-width projection semantics (SURVEY.md §2.1 A4-A9): redaction,
null-on-cast-failure, Oracle dates, CR handling, NUMBER int() parity."""

import datetime

from pyspark.sql import Row

from national_caseload_data_ingest_spark.sources.fixedwidth import (
    project_fixed_width,
)
from national_caseload_data_ingest_spark.sources.schemas import (
    FieldSpec,
    TableSchema,
)

SCHEMA = TableSchema(
    "T",
    (
        FieldSpec("SID", "VARCHAR2", 1, 4),
        FieldSpec("NUM", "NUMBER", 5, 9),
        FieldSpec("DT", "DATE", 10, 20),
        FieldSpec("FLT", "FLOAT", 21, 28),
    ),
)


def _rows(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    out = project_fixed_width(df, SCHEMA)
    return {r["sid"]: r for r in out.collect()}


def test_typed_projection_and_redaction(spark):
    rows = _rows(
        spark,
        [
            "AAAA" + "    7" + "01-JAN-2017" + "    12.5",
            "BBBB" + "    *" + "*          " + "       *",  # redactions
            "CCCC" + " 12.5" + "31-FEB-2017" + "     1e3",  # int() parity + bad date
            "DDDD" + "  007" + "01-jan-0099" + "        ",  # zeros, tiny year
        ],
    )
    a = rows["AAAA"]
    assert a["num"] == 7
    assert a["dt"] == datetime.date(2017, 1, 1)
    assert a["flt"] == 12.5
    assert (a["redacted_sid"], a["redacted_num"], a["redacted_dt"]) == (
        False,
        False,
        False,
    )

    b = rows["BBBB"]
    assert (b["num"], b["dt"], b["flt"]) == (None, None, None)
    assert (b["redacted_num"], b["redacted_dt"], b["redacted_flt"]) == (
        True,
        True,
        True,
    )

    c = rows["CCCC"]
    # '12.5' nulls for NUMBER (python int() raises; Spark cast would give 12)
    assert c["num"] is None and c["redacted_num"] is False
    # 31-FEB → null, NOT redacted (ncd/normal_table.py:109-115)
    assert c["dt"] is None and c["redacted_dt"] is False
    # float('1e3') succeeds in Python — and in Spark's double cast
    assert c["flt"] == 1000.0

    d = rows["DDDD"]
    assert d["num"] == 7  # '007' → 7
    assert d["dt"] == datetime.date(99, 1, 1)  # pre-1000 CE year parses
    assert d["flt"] is None  # empty → null (float('') raises)


def test_varchar_keeps_empty_string(spark):
    rows = _rows(spark, ["    " + "    1" + " " * 11 + " " * 8])
    r = rows[""]
    # str('') never raises → empty string survives, not NULL (SURVEY §1.2)
    assert r["sid"] == "" and r["redacted_sid"] is False


def test_cr_becomes_space_offsets_preserved(spark):
    # A CR inside the NUM field: same row parses as if the CR were a space.
    line = "EEEE" + "  \r 3" + "01-JAN-2017" + "     2.5"
    rows = _rows(spark, [line])
    r = rows["EEEE"]
    assert r["num"] == 3
    assert r["dt"] == datetime.date(2017, 1, 1)
    assert r["flt"] == 2.5


def test_column_order_data_then_shadows(spark):
    df = project_fixed_width(
        spark.createDataFrame([Row(value="x")], ["value"]), SCHEMA
    )
    assert df.columns == [
        "sid",
        "num",
        "dt",
        "flt",
        "redacted_sid",
        "redacted_num",
        "redacted_dt",
        "redacted_flt",
    ]
