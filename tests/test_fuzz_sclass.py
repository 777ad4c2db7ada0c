"""Generator contract for the ``s`` (string-encoding) fuzz class
(round-13 campaign, VERDICT r12 item 1). Pure pyarrow — no
SparkSession: these tests pin that an ``s`` variant actually CONTAINS
the attacks the campaign claims to run (astral-plane 4-byte UTF-8,
zero-width/format characters, NFC/NFD normalization-form twins,
Zs-class Unicode spaces at value edges, U+000B) and that the data
contract still holds. A generator that silently stopped injecting
would otherwise turn the whole FUZZ_ORACLE_r13 sweep into a vacuous
green."""

from __future__ import annotations

import importlib.util
import os
import sys
import unicodedata

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

spec = importlib.util.spec_from_file_location(
    "fuzz_oracle_s", os.path.join(REPO, "tools", "fuzz_oracle.py")
)
fuzz_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fuzz_oracle)

BASE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="driver testdata absent"
)

ZERO_WIDTH = set("​‌‍⁠﻿")
EDGE_SPACES = set(" 　  ")


def _all_strings(variant_dir: str, table: str) -> list[str]:
    tbl = pq.read_table(f"{variant_dir}/{table}.parquet")
    out: list[str] = []
    for field in tbl.schema:
        if field.type in ("string", "large_string"):
            out.extend(v for v in tbl.column(field.name).to_pylist()
                       if v is not None)
    return out


@pytest.fixture(scope="module")
def variant_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzz_s") / "1s")
    fuzz_oracle.make_variant(BASE, out, "1s")
    return out


def test_astral_plane_chars_injected(variant_dir):
    """4-byte UTF-8 (codepoints above U+FFFF) must land in string
    columns of both a big text table and a key-ish name table."""
    for t in ("documents", "part"):
        vals = _all_strings(variant_dir, t)
        assert any(
            any(ord(c) > 0xFFFF for c in v) for v in vals
        ), f"no astral-plane codepoints in {t} strings"


def test_zero_width_chars_injected(variant_dir):
    vals = _all_strings(variant_dir, "documents")
    assert any(set(v) & ZERO_WIDTH for v in vals), (
        "no zero-width/format characters in documents strings"
    )


def test_normalization_form_twins_injected(variant_dir):
    """Both normal forms must coexist: at least one value carrying a
    combining mark whose NFC form differs (a decomposed accent), and
    at least one precomposed accent whose NFD form differs."""
    vals = _all_strings(variant_dir, "documents")
    assert any(
        v != unicodedata.normalize("NFC", v) for v in vals
    ), "no decomposed (NFD-side) values injected"
    assert any(
        v != unicodedata.normalize("NFD", v) for v in vals
    ), "no precomposed (NFC-side) values injected"


def test_edge_unicode_spaces_injected(variant_dir):
    """Zs-class spaces at value EDGES — the trim-divergence bait
    (Spark trims only U+0020)."""
    vals = _all_strings(variant_dir, "documents")
    assert any(
        v and (v[0] in EDGE_SPACES or v[-1] in EDGE_SPACES) for v in vals
    ), "no edge Unicode-space padding injected"


def test_vertical_tab_injected(variant_dir):
    """U+000B is in Java's \\s but not RE2's — every whitespace
    collapse is a differential target."""
    vals = _all_strings(variant_dir, "documents")
    assert any("\x0b" in v for v in vals), "no U+000B injected"


def test_contract_still_holds(variant_dir):
    docs = pq.read_table(f"{variant_dir}/documents.parquet")
    assert not any(v is None for v in docs.column("doc_id").to_pylist())
    ev = pq.read_table(f"{variant_dir}/events.parquet")
    assert not any(v is None for v in ev.column("user_id").to_pylist())


def test_pool_is_case_stable():
    """The platform case-mapping divergence (Java/CPython FULL mappings
    vs utf8proc SIMPLE) is pinned by test_unicode_case_parity, not
    laundered through the differential gate — so the pool must contain
    no uppercase İ, no uppercase Σ, and no word-initial titlecase-
    divergent char (ß, the fi/ff ligatures, ǆ/ǳ/ǌ-class digraphs, ǰ)."""
    word_initial_hazards = set("ßﬁﬂﬀﬃﬄǆǳǌǉǰ")
    for s in fuzz_oracle.S_STRINGS:
        assert "İ" not in s and "Σ" not in s, repr(s)
        for w in s.split():
            assert w[0] not in word_initial_hazards, repr(s)


def test_s_composes_with_t():
    """"1st" must parse (suffix grammar) and carry BOTH attack classes:
    astral strings and mutated timestamps."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "1st")
        fuzz_oracle.make_variant(BASE, out, "1st")
        vals = _all_strings(out, "documents")
        assert any(any(ord(c) > 0xFFFF for c in v) for v in vals)
        base_ts = pq.read_table(f"{BASE}/events.parquet").column("ts").to_pylist()
        var_ts = pq.read_table(f"{out}/events.parquet").column("ts").to_pylist()
        assert base_ts != var_ts, "t-class timestamp attacks absent in 1st"


def test_duplicate_suffix_rejected_loudly():
    """ADVICE r12: '1dd' must raise a real ValueError (an assert would
    be stripped under ``python -O`` and silently run as '1d')."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with pytest.raises(ValueError, match="duplicate suffix"):
            fuzz_oracle.make_variant(BASE, os.path.join(td, "x"), "1dd")


class TestPClassGenerator:
    """Round-13 extension: the parquet PHYSICAL-layout variants must
    actually change the layout they claim to (value-preserving reader
    differential — the timestamp-physical-type-drift bug class). A
    generator that silently wrote default layouts would make the
    p-sweeps vacuous."""

    def test_p1_reverses_columns_and_disables_dictionary(self, tmp_path):
        import pyarrow.parquet as pq

        out = str(tmp_path / "p1")
        fuzz_oracle.make_variant(BASE, out, "p1")
        base_names = pq.read_schema(f"{BASE}/events.parquet").names
        got_names = pq.read_schema(f"{out}/events.parquet").names
        assert got_names == list(reversed(base_names))
        col0 = pq.read_metadata(f"{out}/events.parquet").row_group(0).column(0)
        assert "PLAIN_DICTIONARY" not in str(col0.encodings), col0.encodings

    def test_p2_many_row_groups(self, tmp_path):
        import pyarrow.parquet as pq

        out = str(tmp_path / "p2")
        fuzz_oracle.make_variant(BASE, out, "p2")
        meta = pq.read_metadata(f"{out}/events.parquet")
        assert meta.num_row_groups >= 2, meta.num_row_groups

    def test_p3_int96_timestamps_ms_truncated(self, tmp_path):
        import pyarrow.parquet as pq

        out = str(tmp_path / "p3")
        fuzz_oracle.make_variant(BASE, out, "p3")
        phys = {
            c.path_in_schema: c.physical_type
            for rg in range(1)
            for c in [
                pq.read_metadata(f"{out}/events.parquet").row_group(0).column(i)
                for i in range(
                    pq.read_metadata(f"{out}/events.parquet").num_columns
                )
            ]
        }
        assert phys["ts"] == "INT96", phys
        ts = pq.read_table(f"{out}/events.parquet").column("ts").to_pylist()
        assert all(v is None or v.microsecond % 1000 == 0 for v in ts), (
            "int96 variant must be ms-truncated so the round-trip is "
            "lossless-by-construction"
        )

    def test_p_variants_preserve_values(self, tmp_path):
        import pyarrow.parquet as pq

        out = str(tmp_path / "p1v")
        fuzz_oracle.make_variant(BASE, out, "p1")
        base = pq.read_table(f"{BASE}/part.parquet")
        got = pq.read_table(f"{out}/part.parquet").select(base.schema.names)
        assert got.equals(base), "p variants must be value-preserving"
