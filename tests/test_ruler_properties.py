"""Property-based tests (hypothesis) for the hyphen-ruler width inference —
the parser where header/data misalignment is *silent* corruption (SURVEY §7
hard part 4): a wrong extent doesn't crash, it just slices garbage.

Strategy: generate random column layouts (names, widths, cell values),
render them exactly the way the DOJ global file renders tables (header row,
hyphen-run divider, space-separated fixed columns), and require the parser
to reconstruct the original cells bit-for-bit.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from national_caseload_data_ingest_spark.sources.globals import (
    parse_ruler_fragment,
)
from national_caseload_data_ingest_spark.sources.schemas import (
    infer_ruler_extents,
    slice_by_extents,
)

# Cell text: no whitespace (fixed-width pads with spaces), no leading/trailing
# loss under strip, printable ASCII minus '-'-only confusables is fine.
_cell = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7A
    ),
    min_size=1,
    max_size=8,
)
_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll"), max_codepoint=0x7A),
    min_size=1,
    max_size=10,
)


@st.composite
def ruler_tables(draw):
    n_cols = draw(st.integers(min_value=1, max_value=6))
    names = [draw(_name) for _ in range(n_cols)]
    n_rows = draw(st.integers(min_value=0, max_value=5))
    rows = [
        [draw(st.one_of(_cell, st.just("*"))) for _ in range(n_cols)]
        for _ in range(n_rows)
    ]
    widths = [
        max(
            len(names[c]),
            max((len(r[c]) for r in rows), default=1),
            1,
        )
        for c in range(n_cols)
    ]
    def render(cells):
        return " ".join(c.ljust(w) for c, w in zip(cells, widths)).rstrip()
    lines = [render(names), " ".join("-" * w for w in widths)]
    lines += [render(r) for r in rows]
    return names, rows, "\n".join(lines)


@given(ruler_tables())
@settings(max_examples=200, deadline=None)
def test_roundtrip_reconstructs_cells(table):
    names, rows, fragment = table
    got_names, got_rows = parse_ruler_fragment(fragment)
    n = len(names)
    # data columns first, then redacted_* shadows
    assert len(got_names) == 2 * n
    assert all(g.startswith("redacted_") for g in got_names[n:])
    assert len(got_rows) == len([r for r in rows if any(c for c in r)])
    for want, got in zip(rows, got_rows):
        values, flags = got[:n], got[n:]
        for w, v, f in zip(want, values, flags):
            if w == "*":
                assert v == "" and f is True
            else:
                assert v == w and f is False


@given(ruler_tables())
@settings(max_examples=200, deadline=None)
def test_extents_match_divider_runs(table):
    _, _, fragment = table
    divider = fragment.split("\n")[1]
    extents = infer_ruler_extents(divider)
    # extents are exactly the hyphen-run spans (1-based inclusive), in order
    spans = [(m.start() + 1, m.end()) for m in re.finditer(r"-+", divider)]
    assert extents == spans
    # slicing the divider itself by its own extents yields pure hyphen runs
    assert all(set(c) == {"-"} for c in slice_by_extents(divider, extents))
