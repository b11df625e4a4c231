"""Paginated REST source adapter — driver-side fetch mirroring the
reference's pagination loop (flows/pull_recent_tracks.py:160-198):
``limit`` items per page, follow the ``next`` cursor for at most
``max_extra_pages`` further pages, throttle between pages.

The HTTP transport is injectable (``fetcher``) so tests and air-gapped
runs replace the network with fixtures; the reference's OAuth handling
(:73-109) is driver-side credential management outside the engine
(SURVEY.md §2.2) and stays out.

The fetched page bodies become a one-column DataFrame feeding
``json_flatten.flatten_payload`` → ``operators.idempotent_sink`` — the
complete ingest path.  For a continuous daemon the same fetcher slots into
a custom Python micro-batch data source; the cron-style ``availableNow``
run is what the reference actually does.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str], dict]

RECENTLY_PLAYED_URL = "https://api.spotify.com/v1/me/player/recently-played?limit={limit}"


def fetch_pages(
    fetcher: Fetcher,
    limit: int = 50,
    max_extra_pages: int = 5,
    throttle_seconds: float = 0.0,
) -> list[dict]:
    """Driver-side pagination: first page + ≤``max_extra_pages`` follows."""
    pages: list[dict] = []
    url = RECENTLY_PLAYED_URL.format(limit=limit)
    body = fetcher(url)
    pages.append(body)
    j = 0
    while body.get("next") and j < max_extra_pages:
        if throttle_seconds:
            time.sleep(throttle_seconds)
        body = fetcher(body["next"])
        pages.append(body)
        j += 1
    return pages


def pages_to_df(spark: SparkSession, pages: list[dict]) -> DataFrame:
    """One row per response body, as a JSON string column ``payload``."""
    import json

    return spark.createDataFrame([(json.dumps(p),) for p in pages], "payload string")
