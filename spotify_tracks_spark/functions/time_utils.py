"""Timezone and date-window helpers.

Parity notes (SURVEY.md §7.4):
- ``played_at`` stays a *naive-UTC* timestamp; ``played_at_mtn`` is the
  DST-aware America/Boise wall-clock rendering of the same instant
  (stg_recent_tracks.sql:28-32). Keep both; trailing-window filters use the
  UTC column.
- DuckDB ``date_diff('day', start, end)`` == Spark ``datediff(end, start)``
  (argument order flips).
- Calendar ``year()`` + ISO ``weekofyear()`` — the reference groups weeks by
  this deliberately mismatched pair (rpt_discovery_rate.sql:15-16); reproduce,
  don't fix.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import LOCAL_TZ


def epoch_micros(ts: Column) -> Column:
    """Epoch microseconds, accepting TIMESTAMP or TIMESTAMP_NTZ.

    ``unix_micros`` rejects NTZ inputs; the NTZ→LTZ cast re-interprets the
    wall-clock in the session time zone, which this engine pins to UTC
    (session.py:48), so the cast is identity on the underlying micros and
    matches DuckDB's ``epoch_us`` on the same naive timestamp.
    """
    return F.unix_micros(ts.cast("timestamp"))


def epoch_seconds(ts: Column) -> Column:
    """Epoch seconds (truncating), accepting TIMESTAMP or TIMESTAMP_NTZ.

    Matches DuckDB ``floor(epoch(ts))::bigint`` under the UTC session zone.
    """
    return ts.cast("timestamp").cast("long")


def to_local_wallclock(ts: Column, tz: str = LOCAL_TZ) -> Column:
    """``timezone('America/Boise', cast(ts || '+00' as timestamptz))``.

    Interprets ``ts`` as a UTC instant and renders the wall-clock time in
    ``tz`` (DST-aware), as a zone-less timestamp.
    """
    return F.from_utc_timestamp(ts, tz)


def within_trailing_days(event_ts: Column, run_date: str, days: int = 30) -> Column:
    """``date_diff('day', event, run_date) <= days``.

    Faithful to rpt_track_counts.sql:21-22 / rpt_artist_counts.sql:17-18:
    there is deliberately NO lower bound, so events after ``run_date``
    (negative diff) also pass — reproduce, don't fix.
    """
    return F.datediff(F.lit(run_date).cast("date"), F.to_date(event_ts)) <= days
