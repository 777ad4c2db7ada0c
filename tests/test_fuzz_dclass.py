"""Generator contract for the ``d`` (numeric-edge / dt-boundary) fuzz
class (round-12 campaign, VERDICT r11 item 5). Pure pyarrow — no
SparkSession: these tests pin that a ``d`` variant actually CONTAINS
the attacks the campaign claims to run (exact DECIMAL(12,2) precision
boundaries and int32 edges in measure columns, exact 0.0/1.0 rates,
per-key consecutive instants exactly 0 and ±1 µs apart) and that the
data contract (non-null keys and instants) still holds. A generator
that silently stopped injecting would otherwise turn the whole
FUZZ_ORACLE_r12 sweep into a vacuous green."""

from __future__ import annotations

import datetime as dt
import importlib.util
import os
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

spec = importlib.util.spec_from_file_location(
    "fuzz_oracle_d", os.path.join(REPO, "tools", "fuzz_oracle.py")
)
fuzz_oracle = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fuzz_oracle)

BASE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="driver testdata absent"
)


@pytest.fixture(scope="module")
def variant_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzz_d") / "1d")
    fuzz_oracle.make_variant(BASE, out, "1d")
    return out


def test_measure_columns_carry_exact_edges(variant_dir):
    li = pq.read_table(f"{variant_dir}/lineitem.parquet")
    price = set(
        v for v in li.column("l_extendedprice").to_pylist() if v is not None
    )
    # the DECIMAL(12,2) boundary must appear EXACTLY (survives every
    # >= (18,2) plan cast end to end) and the int32 edges as exact
    # doubles; the generic numeric mutation may negate/zero a few
    # injected values, so assert presence of the positive edges at
    # least (seeded rng: deterministic for variant "1d")
    assert 9_999_999_999.99 in price, "DECIMAL(12,2) boundary not injected"
    assert 2_147_483_647.0 in price or -2_147_483_648.0 in price


def test_rate_columns_hit_exact_zero_and_one(variant_dir):
    li = pq.read_table(f"{variant_dir}/lineitem.parquet")
    disc = [v for v in li.column("l_discount").to_pylist() if v is not None]
    assert 0.0 in disc, "exact 0.0 discount not injected"
    assert 1.0 in disc, "exact 1.0 discount not injected"


def test_per_key_dt_edges_exist(variant_dir):
    ev = pq.read_table(f"{variant_dir}/events.parquet")
    keys = ev.column("user_id").to_pylist()
    ts = ev.column("ts").to_pylist()
    per_key: dict = {}
    for k, v in zip(keys, ts):
        per_key.setdefault(k, []).append(v)
    gaps = set()
    for vs in per_key.values():
        vs = sorted(v for v in vs if v is not None)
        gaps.update(
            (b - a) for a, b in zip(vs, vs[1:])
        )
    assert dt.timedelta(0) in gaps, "no same-key tie instants (dt == 0)"
    assert dt.timedelta(microseconds=1) in gaps, "no same-key 1 µs gap"


def test_contract_still_holds(variant_dir):
    ev = pq.read_table(f"{variant_dir}/events.parquet")
    assert not any(v is None for v in ev.column("ts").to_pylist())
    assert not any(v is None for v in ev.column("user_id").to_pylist())
    orders = pq.read_table(f"{variant_dir}/orders.parquet")
    assert not any(
        v is None for v in orders.column("o_orderdate").to_pylist()
    )


def test_d_composes_with_magnitude():
    """"dm" magnifies FIRST, then injects edges — the boundary values
    must appear unscaled (exact), while base measure values are 1e6×."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "1dm")
        fuzz_oracle.make_variant(BASE, out, "1dm")
        li = pq.read_table(f"{out}/lineitem.parquet")
        price = [
            v for v in li.column("l_extendedprice").to_pylist()
            if v is not None
        ]
        assert 9_999_999_999.99 in price       # exact edge, unscaled
        assert any(abs(v) > 1e8 for v in price)  # magnified base values
