"""Custom Spark Python DataSource for the paginated recently-played feed —
the ingest adapter as a *first-class source*: after registration,
``spark.read.format("recent_tracks").option(...).load()`` plans, prunes and
composes like any built-in source.

Mirrors the reference's ingest semantics (pagination: ≤limit items/page,
follow ``next`` for ≤max_extra_pages, flows/pull_recent_tracks.py:160-198;
flatten: null-safe nested access + order-preserving artist join,
:112-151) with the transport injected as an option:

- ``pages_path``: a JSON file holding the list of page bodies — the
  offline/fixture transport used in this container;
- a production deployment points the same reader at HTTPS (the fetch runs
  executor-side inside ``read``); the API cursor is inherently serial, so
  the source is single-partition — parallelism belongs downstream, after
  the (tiny) page batch lands.

The streaming variant of this pattern is ``streaming/ingest.py``; the
Spark-expression flatten of the same payload is ``sources/json_flatten.py``
— a test pins this reader and that flatten to identical output.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader

SCHEMA = (
    "track_name string, track_album string, track_artists string, "
    "album_release_date string, release_date_precision string, "
    "track_popularity double, played_at string, context string, "
    "duration_ms double"
)


def flatten_item(item: dict) -> tuple:
    """One API item → the 9-column source row (null-safe on context and
    every nested field, like the reference's Python flatten)."""
    track = item.get("track") or {}
    album = track.get("album") or {}
    context = item.get("context") or None
    artists = track.get("artists") or []
    pop = track.get("popularity")
    dur = track.get("duration_ms")
    return (
        track.get("name"),
        album.get("name"),
        ", ".join(a.get("name") for a in artists),
        album.get("release_date"),
        album.get("release_date_precision"),
        float(pop) if pop is not None else None,
        item.get("played_at"),
        context.get("type") if context else None,
        float(dur) if dur is not None else None,
    )


class RecentTracksReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pages_path = options.get("pages_path")
        if not self.pages_path:
            raise ValueError(
                "recent_tracks source requires a 'pages_path' option "
                "(offline transport); wire an HTTP fetcher here on a "
                "network-capable cluster"
            )
        self.max_pages = 1 + int(options.get("max_extra_pages", 5))

    def read(self, partition) -> Iterator[tuple]:
        with open(self.pages_path) as f:
            pages = json.load(f)
        for page in pages[: self.max_pages]:
            for item in page.get("items", []):
                yield flatten_item(item)


class RecentTracksDataSource(DataSource):
    """``spark.read.format("recent_tracks")`` after
    ``spark.dataSource.register(RecentTracksDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "recent_tracks"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> RecentTracksReader:
        return RecentTracksReader(self.options)
