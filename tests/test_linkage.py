

# -- soundex -------------------------------------------------------------------

NARA_VECTORS = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
    "Jackson": "J250", "VanDeusen": "V532", "Honeyman": "H555",
}


def test_soundex_python_reference_matches_nara():
    from national_caseload_data_ingest_spark.operators.linkage import (
        soundex_py,
    )

    for name, want in NARA_VECTORS.items():
        assert soundex_py(name) == want, name


def test_soundex_sql_matches_python_reference():
    """The shared SQL expression (executed here by DuckDB — the oracle's
    engine) must agree with the independent Python reference on the
    NARA vectors, vowel-led and h/w-led names, and real color words."""
    import duckdb

    from national_caseload_data_ingest_spark.operators.linkage import (
        soundex_py,
        soundex_sql,
    )

    names = list(NARA_VECTORS) + [
        "aqua", "azure", "orange", "ivory", "umber",   # vowel-led
        "white", "wheat", "hazel", "honey",            # h/w-led
        "chartreuse", "chiffon", "chocolate", "blanched",
    ]
    rows = duckdb.sql(
        "SELECT w, " + soundex_sql("w")
        + " FROM (SELECT unnest(" + repr(names) + ") AS w)"
    ).fetchall()
    assert all(got == soundex_py(w) for w, got in rows), rows


def test_soundex_spark_expression_matches(spark):
    from national_caseload_data_ingest_spark.operators.linkage import (
        soundex_py,
        soundex_sql,
    )
    from pyspark.sql import functions as F

    names = list(NARA_VECTORS) + ["aqua", "white", "honeydew"]
    df = spark.createDataFrame([(n,) for n in names], "w string")
    got = {r.w: r.sx for r in
           df.select("w", F.expr(soundex_sql("w")).alias("sx")).collect()}
    assert got == {n: soundex_py(n) for n in names}


def test_soundex_sql_matches_reference_on_random_words():
    """Hypothesis-style sweep (fixed seed): the shared SQL expression
    and the Python reference agree on arbitrary alphabetic words —
    collapse runs, h/w bridges, vowel separators in every arrangement."""
    import random

    import duckdb

    from national_caseload_data_ingest_spark.operators.linkage import (
        soundex_py,
        soundex_sql,
    )

    rng = random.Random(20260816)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(500)
    ]
    # salt in pathological shapes: long same-code runs, h/w sandwiches
    words += ["bpbpbp", "ccccc", "ahahaha", "wbwbwb", "hhhh", "aeiouy",
              "szszsz", "mnmnm", "rhrhr", "tdtdtd"]
    rows = duckdb.sql(
        "SELECT w, " + soundex_sql("w")
        + " FROM (SELECT unnest(" + repr(words) + ") AS w)"
    ).fetchall()
    bad = [(w, got, soundex_py(w)) for w, got in rows
           if got != soundex_py(w)]
    assert not bad, bad[:5]
