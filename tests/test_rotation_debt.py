"""Ratchet on the never-driver-rowed tail (round-10 verdict item 7).

``bench.rotation_debt()`` counts registered queries that have never held
a driver correctness slot (union of checked-in CORRECTNESS_r*.json keys)
and are not on the current 50-entry driver surface (those receive their
first row when the driver runs this round).

The ratchet below counts only queries that ALREADY EXISTED at the
previous round's close (keys of the latest checked-in BENCH_FULL):
operators registered mid-round necessarily start never-rowed and get
their rotation chance next round, so they appear in the emitted gauge
but don't trip the ceiling.  The ceiling must be RATCHETED DOWN each
round as the rotation retires the tail — raising it is a process
regression, and the test failing on a raise makes that mechanically
visible instead of judge-recomputed.

History: r10 close = 89 never-rowed / 264 registered; r11 rotation put
20 of them on the driver surface → pre-existing debt 69.
"""

from __future__ import annotations

import json
import os
import re

import bench

# Highest allowed pre-existing debt.  Ratchet DOWN when a rotation
# lands; never raise.
ROTATION_DEBT_CEILING = 69


def _prev_round_surface() -> set[str]:
    """Query names benched at the PREVIOUS round's close.

    The previous round is derived from the driver-written BENCH_r*.json
    counter (``bench._next_round_no() - 1``), NOT from the highest
    BENCH_FULL present: the current round may legitimately check in its
    own BENCH_FULL before close (round 11 commits a before/after pair),
    and reading that file would wrongly promote operators registered
    THIS round into the pre-existing set."""
    root = os.path.dirname(os.path.abspath(bench.__file__))
    prev = bench._next_round_no() - 1
    path = os.path.join(root, f"BENCH_FULL_r{prev:02d}.json")
    if not os.path.exists(path):
        path = os.path.join(root, f"BENCH_FULL_r{prev}.json")
    with open(path) as fh:
        return set(json.load(fh)["queries"])


def test_rotation_debt_monotonically_decreases() -> None:
    debt = bench.rotation_debt()
    pre_existing = sorted(set(debt) & _prev_round_surface())
    assert len(pre_existing) <= ROTATION_DEBT_CEILING, (
        f"rotation debt grew to {len(pre_existing)} "
        f"(> {ROTATION_DEBT_CEILING}): the driver rotation must keep "
        f"retiring the never-rowed tail; tail = {pre_existing[:10]}..."
    )


def test_driver_surface_spends_slots_on_never_rowed() -> None:
    """Every rotation must keep >= 20 first-ever rows queued while debt
    remains (the round-9/10 verdict pace), so the tail drains in a
    bounded number of rounds."""
    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.abspath(bench.__file__))
    rowed: set[str] = set()
    for f in os.listdir(root):
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f):
            with open(os.path.join(root, f)) as fh:
                rowed |= set(json.load(fh))
    driver = set(entrymod.queries())
    queued_first_rows = driver - rowed
    if bench.rotation_debt():
        assert len(queued_first_rows) >= 20, (
            f"only {len(queued_first_rows)} never-rowed queries hold "
            f"driver slots while {len(bench.rotation_debt())} wait"
        )
