"""tools/gen_psl.py — the PSL snapshot regenerator (VERDICT r14 #3).

Pure-Python tests over a synthetic public_suffix_list.dat in the
official format (https://publicsuffix.org/list/): section markers,
comments, exact/wildcard/exception rule grammar, IDNA twin emission,
1-label drop, depth cap accounting, and emit round-trip."""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import gen_psl  # noqa: E402

_DAT = """\
// This is a comment; the next block is the ICANN section.
// ===BEGIN ICANN DOMAINS===
com
uk
co.uk
// wildcard ccTLD with an exception
*.ck
!www.ck
// a unicode rule (IDNA twin must be emitted too)
ком.ру
// too deep under --max-labels 4
a.b.c.d.e
// ===END ICANN DOMAINS===

// ===BEGIN PRIVATE DOMAINS===
github.io
*.compute.amazonaws.com
blogspot.co.uk  // trailing token noise after whitespace is ignored
// ===END PRIVATE DOMAINS===
"""


def test_parse_dat_full_grammar():
    exact, wild, exc, counts, dropped = gen_psl.parse_dat(
        _DAT, {"icann", "private"}, max_labels=4
    )
    # 1-label rules (com, uk) dropped — implicit-* default covers them
    assert "com" not in exact and "uk" not in exact
    assert "co.uk" in exact
    assert "github.io" in exact
    assert "blogspot.co.uk" in exact
    # unicode rule keeps the unicode form AND gains the punycode twin
    assert "ком.ру" in exact
    assert any(s.startswith("xn--") for s in exact)
    assert wild == ["ck", "compute.amazonaws.com"]
    assert exc == ["www.ck"]
    assert counts["icann"] == 7 and counts["private"] == 3
    assert dropped == 1  # a.b.c.d.e exceeds 4 labels


def test_parse_dat_section_subset():
    exact, wild, _, _, _ = gen_psl.parse_dat(
        _DAT, {"private"}, max_labels=5
    )
    assert "co.uk" not in exact  # ICANN excluded
    assert "github.io" in exact
    assert wild == ["compute.amazonaws.com"]


def test_emit_round_trip(tmp_path):
    exact, wild, exc, _, _ = gen_psl.parse_dat(
        _DAT, {"icann", "private"}, max_labels=5
    )
    out = tmp_path / "psl_data.py"
    out.write_text(gen_psl.emit(exact, wild, exc, "test snapshot"))
    spec = importlib.util.spec_from_file_location("psl_data_test", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.EXACT_RULES) == set(exact)
    assert set(mod.WILDCARD_BASES) == set(wild)
    assert set(mod.EXCEPTION_RULES) == set(exc)
    # deeper-than-today rules survive the round trip (depth-generic)
    assert "a.b.c.d.e" in mod.EXACT_RULES


def test_generated_tables_drive_the_matcher():
    """The depth-generic grouping in operators/psl.py consumes a
    generated table set identical in shape to gen_psl.py output — the
    drop-in contract: psl._by_labels + the matcher loops handle any
    depth present in the data."""
    from etl_excel_csv_sql_spark.operators import psl

    # simulate a regenerated snapshot with a 5-label exact rule
    by_k = psl._by_labels(["co.uk", "a.b.c.d.e", "github.io"])
    assert by_k[2] == ("co.uk", "github.io")
    assert by_k[5] == ("a.b.c.d.e",)
