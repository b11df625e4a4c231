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

The source is also a MICRO-BATCH STREAM (``spark.readStream.format(
"recent_tracks")``): offsets are page indices, so each trigger drains the
pages that became available since the last checkpoint — exactly the
reference's cron-poll semantics (one run consumes the current API window,
the checkpoint replaces Prefect's dedup-by-insert as the progress record).
``readBetweenOffsets`` replays a committed range deterministically for
failure recovery.  The file-source streaming ingest over the events table
is ``streaming/ingest.py``; the Spark-expression flatten of the same
payload is ``sources/json_flatten.py`` — a test pins this reader and that
flatten to identical output.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

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


class RecentTracksStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the paginated feed: offset = next unread
    page index.  Each ``read`` drains every currently-available page (the
    polled API window); a later trigger picks up pages appended to the
    transport since — the cron-poll loop as checkpointed stream progress.
    """

    def __init__(self, options: dict) -> None:
        self.pages_path = options.get("pages_path")
        if not self.pages_path:
            raise ValueError(
                "recent_tracks stream requires a 'pages_path' option "
                "(offline transport); wire an HTTP fetcher here on a "
                "network-capable cluster"
            )

    def _pages(self) -> list[dict]:
        with open(self.pages_path) as f:
            return json.load(f)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pages = self._pages()
        end = {"page": len(pages)}
        rows = [
            flatten_item(item)
            for page in pages[start["page"]:]
            for item in page.get("items", [])
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a committed range (restart recovery)
        pages = self._pages()
        return iter(
            flatten_item(item)
            for page in pages[start["page"]:end["page"]]
            for item in page.get("items", [])
        )


class RecentTracksDataSource(DataSource):
    """``spark.read.format("recent_tracks")`` (batch) or
    ``spark.readStream.format("recent_tracks")`` (micro-batch stream)
    after ``spark.dataSource.register(RecentTracksDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "recent_tracks"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> RecentTracksReader:
        return RecentTracksReader(self.options)

    def simpleStreamReader(self, schema) -> RecentTracksStreamReader:
        return RecentTracksStreamReader(self.options)
