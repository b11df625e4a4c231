"""As-of join unit tests + a plan lint across the whole query surface."""

from __future__ import annotations

import datetime as dt

import pytest

import __spark_entry__ as entrymod
from spotify_tracks_spark.operators.asof import asof_join

from .conftest import SF_SMOKE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 12:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "p4"),  # user with no right rows
        ],
        "user_id: long, ts: timestamp, pid: string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), "c1"),
            (1, _ts("2024-01-01 10:00:00"), "c2"),  # ties p1's ts exactly
            (1, _ts("2024-01-01 11:59:00"), "c3"),
            (2, _ts("2024-01-01 09:30:00"), "c4"),  # after p3
        ],
        "user_id: long, ts: timestamp, cid: string",
    )
    return left, right


def test_asof_matches_latest_at_or_before(spark, asof_fixture):
    left, right = asof_fixture
    out = {
        r.pid: r.asof_cid
        for r in asof_join(left, right, ["user_id"], "ts", ["cid"]).collect()
    }
    assert out["p1"] == "c2"  # equal-ts right row matches (at-or-before)
    assert out["p2"] == "c3"  # latest preceding, not first
    assert out["p3"] is None  # right rows exist but all later
    assert out["p4"] is None  # no right rows for the key at all


def test_asof_null_payload_fields_survive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "user_id: long, ts: timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), None)],
        "user_id: long, ts: timestamp, note: string",
    )
    row = asof_join(left, right, ["user_id"], "ts", ["note", "ts"]).collect()[0]
    # the matched ROW is found even though its payload field is NULL
    assert row.asof_ts == _ts("2024-01-01 09:00:00")
    assert row.asof_note is None


def test_no_accidental_cartesian_products(spark):
    """Plan lint: no query may compile to a CartesianProduct.  Intentional
    small-side cross joins must go through broadcast (BroadcastNestedLoop)."""
    qs = entrymod.queries()
    skip = {  # streaming / sink queries execute eagerly; lint is for plans
        "events_stream_dedup",
        "events_stream_window",
        "events_stream_sessionize",
        "publish_roundtrip",
    }
    for name, fn in qs.items():
        if name in skip:
            continue
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} has a cartesian product"
