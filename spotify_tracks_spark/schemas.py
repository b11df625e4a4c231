"""Explicit schemas — no inference anywhere (SURVEY.md §1.3).

``SRC_RECENT_TRACKS`` column list and order are authoritative from the
reference INSERT statement (flows/pull_recent_tracks.py:221-223); types from
the pydantic ``Track`` model (:14-28) — note ``track_popularity`` and
``duration_ms`` are *floats* at ingest (pydantic declares ``float``), only
cast down in staging.

``RECENTLY_PLAYED_PAYLOAD`` mirrors the nested Spotify API response consumed
by ``_get_items`` (flows/pull_recent_tracks.py:112-151) for the JSON-flatten
ingest path.
"""

from __future__ import annotations

from pyspark.sql import types as T

SRC_RECENT_TRACKS = T.StructType(
    [
        T.StructField("track_name", T.StringType(), False),
        T.StructField("track_album", T.StringType(), False),
        T.StructField("track_artists", T.StringType(), False),
        T.StructField("album_release_date", T.StringType(), True),
        T.StructField("release_date_precision", T.StringType(), False),
        T.StructField("track_popularity", T.DoubleType(), True),
        T.StructField("played_at", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
        T.StructField("duration_ms", T.DoubleType(), False),
    ]
)

_ALBUM = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("release_date_precision", T.StringType()),
    ]
)

_TRACK = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("album", _ALBUM),
        T.StructField("artists", T.ArrayType(T.StructType([T.StructField("name", T.StringType())]))),
    ]
)

RECENTLY_PLAYED_PAYLOAD = T.StructType(
    [
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("played_at", T.StringType()),
                        T.StructField("context", T.StructType([T.StructField("type", T.StringType())])),
                        T.StructField("track", _TRACK),
                    ]
                )
            ),
        ),
        T.StructField("next", T.StringType()),
    ]
)
