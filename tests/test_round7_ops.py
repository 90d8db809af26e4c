"""Ground-truth tests for the round-7 late additions: Jaro–Winkler
linkage (parity against DuckDB's builtin, which the oracle relies on)
and the exact-integer EWMA rollup."""

from __future__ import annotations

import random

import duckdb
import pytest

from national_caseload_data_ingest_spark.operators.linkage import (
    JW_MIN_SIM,
    jaro_winkler,
    link_customer_records_jw,
)
from national_caseload_data_ingest_spark.operators.timeseries import (
    EWMA_BAND_DAYS,
    EWMA_WEIGHTS,
    ewma_daily_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ Jaro–Winkler


@pytest.mark.parametrize(
    ("s1", "s2", "expected"),
    [
        ("martha", "marhta", 0.9611111111111111),  # Winkler's own example
        ("dwayne", "duane", 0.84),
        ("same", "same", 1.0),
        ("", "x", 0.0),
        ("x", "", 0.0),
        ("abc", "xyz", 0.0),
    ],
)
def test_jw_known_values(s1, s2, expected):
    assert jaro_winkler(s1, s2) == pytest.approx(expected, abs=1e-12)


def test_jw_matches_duckdb_exactly():
    """The oracle's validity rests on bit-for-bit parity with DuckDB's
    jaro_winkler_similarity — fuzz it."""
    con = duckdb.connect()
    rng = random.Random(42)
    pool = [
        f"Customer#{rng.randint(0, 999999):09d}" for _ in range(100)
    ] + ["".join(rng.choice("abcdef") for _ in range(rng.randint(0, 12))) for _ in range(100)]
    for _ in range(400):
        a, b = rng.choice(pool), rng.choice(pool)
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(d, abs=1e-12), (a, b)


def test_jw_query_pairs_verified(spark):
    rows = link_customer_records_jw(spark, SF_DIR).collect()
    assert rows, "no JW links at sf0.001"
    for r in rows[:50]:
        assert r.key_a < r.key_b
        assert r.sim >= JW_MIN_SIM


# ------------------------------------------------------------ EWMA


def test_ewma_weights_exact():
    # 9**d * 10**(band-d) is the exact integer scaling of 0.9**d
    for d, w in enumerate(EWMA_WEIGHTS):
        assert w == 9**d * 10 ** (EWMA_BAND_DAYS - d)
        assert w / EWMA_WEIGHTS[0] == pytest.approx(0.9**d, rel=1e-12)


def test_ewma_matches_pandas_recompute(spark):
    """Recompute one priority's truncated EWMA in pandas float math and
    compare to within float tolerance (the exact-integer path is the
    oracle's job; this pins the semantics independently)."""
    out = ewma_daily_revenue(spark, SF_DIR).toPandas()
    assert len(out)
    pri = out.priority.iloc[0]
    sub = out[out.priority == pri].sort_values("day").reset_index(drop=True)

    import pandas as pd

    from national_caseload_data_ingest_spark.session import get_spark

    o = (
        get_spark()
        .read.parquet(f"{SF_DIR}/orders.parquet")
        .toPandas()
    )
    o = o[o.o_orderpriority == pri]
    o["day"] = o.o_orderdate.dt.date
    daily = o.groupby("day").o_totalprice.sum()
    days = {d: i for i, d in enumerate(sorted(daily.index))}
    dnum = {d: (pd.Timestamp(d) - pd.Timestamp("1992-01-01")).days for d in daily.index}
    for _, row in sub.head(40).iterrows():
        day = pd.Timestamp(row.day).date()
        dn = dnum[day]
        num = den = 0.0
        for d2, rev in daily.items():
            diff = dn - dnum[d2]
            if 0 <= diff <= EWMA_BAND_DAYS:
                w = 0.9**diff
                num += rev * w
                den += w
        assert row.ewma == pytest.approx(num / den, rel=1e-9), day
        assert row.daily_rev == pytest.approx(daily[day], rel=1e-9)


def test_ewma_single_day_is_identity(spark):
    """A day with no prior days inside the band smooths to itself."""
    out = ewma_daily_revenue(spark, SF_DIR).toPandas()
    import pandas as pd

    out["d"] = pd.to_datetime(out.day)
    for pri, grp in out.groupby("priority"):
        grp = grp.sort_values("d")
        first = grp.iloc[0]
        # the first day of the series has an empty lookback band
        prior = grp[
            (grp.d < first.d) & (grp.d >= first.d - pd.Timedelta(days=EWMA_BAND_DAYS))
        ]
        if len(prior) == 0:
            assert first.ewma == pytest.approx(first.daily_rev, abs=1e-6)
