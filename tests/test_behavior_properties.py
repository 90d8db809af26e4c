"""Property-based invariants for SCD2 intervals and funnel progress:
random event sequences, checked against independent pure-Python
references and structural invariants (hypothesis)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.operators.behavior import (
    funnel_user_steps,
)
from national_caseload_data_ingest_spark.operators.timeseries import (
    scd2_intervals,
)

STEPS = ("view", "click", "purchase")
TYPES = ["view", "click", "purchase", "error"]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.sampled_from(TYPES),
        st.integers(0, 40),  # minute offset (duplicates allowed)
    ),
    min_size=1,
    max_size=25,
)


def _mk_df(spark, evs):
    rows = [
        (i, u, t, datetime(2024, 1, 1) + timedelta(minutes=m))
        for i, (u, t, m) in enumerate(evs)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_scd2_invariants(spark, evs):
    # one event per (user, minute): with equal timestamps the operator
    # tiebreaks on event_id, but the OUTPUT carries no event_id, so the
    # order of two zero-length intervals sharing a valid_from is not
    # reconstructable from the result relation — that corner gets its
    # own deterministic test below; the property here covers every
    # observably-ordered sequence
    seen: set[tuple[int, int]] = set()
    evs = [
        e for e in evs
        if (e[0], e[2]) not in seen and not seen.add((e[0], e[2]))
    ]
    rows = sorted(
        scd2_intervals(_mk_df(spark, evs)).collect(),
        key=lambda r: (r["user_id"], r["valid_from"], r["state"]),
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # independent reference: collapse consecutive states per user
    ref: dict[int, list[str]] = {}
    for i, (u, t, m) in sorted(
        enumerate(evs), key=lambda x: (x[1][0], x[1][2], x[0])
    ):
        seq = ref.setdefault(u, [])
        if not seq or seq[-1] != t:
            seq.append(t)
    assert set(by_user) == set(ref)
    for u, ivs in by_user.items():
        # interval chain: each valid_to equals the next valid_from;
        # exactly one open (current) interval, at the end
        assert [iv["state"] for iv in ivs] == ref[u]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert not a["is_current"]
            assert a["state"] != b["state"]
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None


def test_scd2_equal_ts_tiebreak_on_event_id(spark):
    """Two events at the SAME timestamp: the operator orders them by
    event_id — the earlier id becomes a zero-length interval, the later
    id the current state (the corner the property test scopes out)."""
    from datetime import datetime

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(0, 1, "view", t), (1, 1, "click", t)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = scd2_intervals(df).collect()
    assert len(rows) == 2
    cur = next(r for r in rows if r["is_current"])
    zero = next(r for r in rows if not r["is_current"])
    assert cur["state"] == "click" and cur["valid_to"] is None
    assert zero["state"] == "view"
    assert zero["valid_from"] == zero["valid_to"] == t


def _ref_funnel(evs, steps):
    """Greedy min-time reference: t_k = min ts of step k strictly after
    t_{k-1}."""
    out = {}
    users = {u for u, _, _ in evs}
    for u in users:
        mine = sorted(
            [(m, i, t) for i, (uu, t, m) in enumerate(evs) if uu == u]
        )
        reached, last = 0, None
        for k, name in enumerate(steps, start=1):
            cand = [
                m for m, _, t in mine
                if t == name and (last is None or m > last)
            ]
            if not cand:
                break
            last = min(cand)
            reached = k
        if reached:
            out[u] = (reached, last)
    return out


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_funnel_user_steps_matches_reference(spark, evs):
    got = {
        r["user_id"]: (
            r["step_reached"],
            int((r["reached_ts"] - datetime(2024, 1, 1)).total_seconds() // 60),
        )
        for r in funnel_user_steps(_mk_df(spark, evs), STEPS).collect()
    }
    assert got == _ref_funnel(evs, STEPS)
