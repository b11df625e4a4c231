"""Q1 — ``stg_recent_tracks``: typed/enriched projection of the source log.

Reference: dbt_spotify/models/staging/stg_recent_tracks.sql:1-35.
One output row per source row; 13 columns = 4 surrogate keys + renames +
casts + timezone rendering.

Parity notes (SURVEY.md §7.4):
- Surrogate keys hash the *raw source strings* (the ``album_release_date``
  inside the keys is the pre-cast string, not the CASE-typed date).
- The release-date CASE handles only 'day'/'year'; 'month' precision falls
  through to NULL — reproduce, don't fix (stg_recent_tracks.sql:22-25).
- ``track_popularity``: double → tinyint (ByteType).
- ``played_at`` = naive-UTC timestamp; ``played_at_mtn`` = America/Boise
  wall clock of the same instant.

Scale: pure narrow projection — no shuffle, fully whole-stage-codegen'd,
pipelined into whatever consumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import surrogate_key, to_local_wallclock


def stg_recent_tracks(src: DataFrame) -> DataFrame:
    rdp = F.col("release_date_precision")
    rd = F.col("album_release_date")
    return src.select(
        surrogate_key("track_name", "track_album", "track_artists", "played_at").alias("play_id"),
        surrogate_key("track_name", "track_album", "album_release_date", "track_artists").alias("track_id"),
        surrogate_key("track_album", "album_release_date").alias("album_id"),
        surrogate_key("track_artists").alias("artist_id"),
        "track_name",
        "track_album",
        "track_artists",
        F.when(rdp == "day", rd)
        .when(rdp == "year", F.concat(rd, F.lit("-01-01")))
        .cast("date")
        .alias("album_release_date"),
        F.col("track_popularity").cast("tinyint").alias("track_popularity"),
        F.col("played_at").cast("timestamp").alias("played_at"),
        to_local_wallclock(F.col("played_at").cast("timestamp")).alias("played_at_mtn"),
        "context",
        "duration_ms",
    )
