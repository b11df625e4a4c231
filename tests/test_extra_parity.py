"""Oracle parity for the pytest-only surface (``extra_queries()``).

The driver's correctness harness records at most ~50 queries (round 1: all
47 then present; round 2: exactly the first 50 of 63 — see the
__spark_entry__ module docstring).  Entries beyond that cap live in
``extra_queries()`` and get the SAME order-insensitive value-hash compare
here, at sf0.001, on every pytest run — so "not in CORRECTNESS_rNN.json"
never means "unchecked".  The three approximate operators (kmeans, approx
stats, HLL rollup) have no exact oracle by design: rows-only here,
tolerance bounds in their own unit tests.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMOKE
from .harness import compare

EXTRA = entrymod.extra_queries()
EXTRA_ORACLES = entrymod.extra_oracle_sql()


def test_driver_surface_is_exactly_fifty():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) == 50
    # every driver entry has an oracle (no rows-only rows in the capped
    # driver budget) and no stale oracle keys
    assert set(osql) == set(qs)
    # the two surfaces are disjoint and jointly cover every operator name
    assert not set(EXTRA) & set(qs)


@pytest.mark.parametrize("name", sorted(EXTRA))
def test_extra_entry_matches_oracle(spark, name):
    df = EXTRA[name](spark, SF_SMOKE)
    if name in EXTRA_ORACLES:
        ok, msg = compare(df, EXTRA_ORACLES[name], SF_SMOKE)
        assert ok, f"{name}: {msg}"
    else:
        # approximate by construction — rows-only (tolerance unit tests
        # pin the estimates)
        assert df.count() > 0


def _sf001_rotation_slice(size: int = 40) -> list[str]:
    """A deterministic, round-rotating slice of the oracled extras for
    the sf0.01 tier.  sf0.001 can hide distribution-sensitive bugs
    (empty blocks, single-partition accidents — the round-6 advice), but
    running all ~170 extras at sf0.01 every pytest run would triple the
    suite wall time; instead each ROUND checks a different ~40-query
    window (keyed on the driver's CORRECTNESS_r*.json count, so the
    slice is stable within a round and advances with it — full coverage
    every ~4-5 rounds, on top of the recorded full-surface
    scripts/check_parity.py sweeps; widened 20 → 40 per the round-7
    brief to halve the latency of catching a distribution-sensitive
    bug, ~2 min extra wall)."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    round_no = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    names = sorted(set(EXTRA) & set(EXTRA_ORACLES))
    start = (round_no * size) % len(names)
    window = names[start : start + size]
    if len(window) < size:  # wrap around
        window += names[: size - len(window)]
    return window


@pytest.mark.parametrize("name", _sf001_rotation_slice())
def test_extra_entry_matches_oracle_at_sf001(spark, name):
    """The rotating sf0.01 tier: the same hash-compare as above at the
    driver's oracle scale (10x rows, multiple parquet row groups)."""
    sf_dir = "/root/testdata/sf0.01"
    df = EXTRA[name](spark, sf_dir)
    ok, msg = compare(df, EXTRA_ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"
