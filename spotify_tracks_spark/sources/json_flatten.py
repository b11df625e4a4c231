"""JSON payload flatten — the ingest transformation of the reference
(``_get_items``, flows/pull_recent_tracks.py:112-151) as declarative
Spark expressions.

The reference flattens the nested Spotify ``recently-played`` response in
Python dict code; here it is ``from_json`` + ``explode(items)`` + struct
field access (null-safe by construction in Spark) + ``array_join`` over the
artists array (order-preserving, matching ``", ".join(...)`` at :132-141).
Output columns/order = the source INSERT list (:221-223).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import udtf

from ..schemas import RECENTLY_PLAYED_PAYLOAD


def flatten_payload(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """raw: one row per API response body (string col ``json_col``)."""
    item = F.col("item")
    track = item["track"]
    return (
        raw.select(F.from_json(F.col(json_col), RECENTLY_PLAYED_PAYLOAD).alias("r"))
        .select(F.explode("r.items").alias("item"))
        .select(
            track["name"].alias("track_name"),
            track["album"]["name"].alias("track_album"),
            F.array_join(
                F.transform(track["artists"], lambda a: a["name"]), ", "
            ).alias("track_artists"),
            track["album"]["release_date"].alias("album_release_date"),
            track["album"]["release_date_precision"].alias("release_date_precision"),
            track["popularity"].alias("track_popularity"),
            item["played_at"].alias("played_at"),
            item["context"]["type"].alias("context"),  # null-safe: NULL struct → NULL field
            track["duration_ms"].alias("duration_ms"),
        )
    )


# popularity/duration are DOUBLES at ingest, matching the reference's
# pydantic float declarations (schemas.py:5-6) and the expression flatten.
_FLATTEN_UDTF_SCHEMA = (
    "track_name: string, track_album: string, track_artists: string,"
    " album_release_date: string, release_date_precision: string,"
    " track_popularity: double, played_at: string, context: string,"
    " duration_ms: double"
)


@udtf(returnType=_FLATTEN_UDTF_SCHEMA)
class FlattenPayloadUDTF:
    """Python UDTF (table function) form of the flatten — one payload row
    in, one row per item out, the lateral-join API class the expression
    surface doesn't exercise.  Row-at-a-time Python IS the slow path
    (SURVEY.md §7.3); this exists as API coverage pinned byte-equal to
    ``flatten_payload``, which stays the hot path.  The dict-walking body
    mirrors the reference's ``_get_items`` (pull_recent_tracks.py:112-151)
    shape: UDTFs are where genuinely imperative per-record logic would
    live if expressions could not express it."""

    def eval(self, payload: str):
        if not payload:
            return
        body = json.loads(payload)
        for item in body.get("items") or []:
            track = item.get("track") or {}
            album = track.get("album") or {}
            context = item.get("context") or None
            artists = [
                a.get("name")
                for a in (track.get("artists") or [])
                if a.get("name") is not None
            ]
            yield (
                track.get("name"),
                album.get("name"),
                ", ".join(artists),
                album.get("release_date"),
                album.get("release_date_precision"),
                track.get("popularity"),
                item.get("played_at"),
                context.get("type") if context else None,
                track.get("duration_ms"),
            )


def flatten_payload_udtf(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """UDTF-based flatten over the same payload column; output pinned
    equal to ``flatten_payload`` by ``tests/test_ingest.py``."""
    return raw.lateralJoin(
        FlattenPayloadUDTF(F.col(json_col).outer())
    ).drop(json_col)
