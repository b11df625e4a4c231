"""Q5 — ``fct_played_track``: one row per play with surrogate FKs.

Reference: dbt_spotify/models/marts/fct_played_track.sql:1-18.  A pure
projection of staging (the ORDER BY inside the reference's table
materialization carries no guarantee — omitted, SURVEY.md §2.6).

Scale: at 100 TB this is the table to partition by ``to_date(played_at)``
and bucket by ``track_id`` (see plans/pipeline.py) so the trailing-window
reports prune partitions and the dim joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fct_played_track(stg: DataFrame) -> DataFrame:
    return stg.select(
        "play_id",
        "track_id",
        "album_id",
        "played_at",
        "played_at_mtn",
        "track_popularity",
        "context",
    )
