"""Model lineage, exposures, and column documentation — the engine-side
equivalent of the reference's dbt metadata surface:

- lineage:   dbt's ref() graph (implicit in dbt_spotify/models/**/*.sql)
             and the Prefect Asset keys (flows/pull_recent_tracks.py:30-53)
- exposures: dbt_spotify/models/marts/_spotify__exposures.yml:1-16 — the
             downstream dashboard consuming the three report marts
- docs:      dbt_spotify/models/**/_spotify__models.yml +
             _spotify__docs.md — per-model and per-column prose

This is data, not prose in a README: ``tests/test_models.py`` asserts the
lineage closes over ``run_models`` and that every documented column exists
in the built DataFrame's schema (and vice versa for models with full
docs), so the docs cannot silently rot.  The declared *tests* from the
same YAML files are enforced at run time by ``checks.py``.
"""

from __future__ import annotations

# model -> direct upstream dependencies (the dbt ref() graph).
LINEAGE: dict[str, list[str]] = {
    "stg_recent_tracks": [],
    "dim_track": ["stg_recent_tracks"],
    "dim_artist": ["stg_recent_tracks"],
    "dim_album": ["stg_recent_tracks"],
    "fct_played_track": ["stg_recent_tracks"],
    "rpt_track_counts": ["fct_played_track", "dim_track", "dim_album"],
    "rpt_artist_counts": ["fct_played_track", "dim_track"],
    "rpt_discovery_rate": ["fct_played_track", "dim_track", "dim_artist"],
}

# Downstream consumers outside the DAG (dbt "exposures"): name -> metadata.
EXPOSURES: dict[str, dict] = {
    "tracks_dashboard": {
        "type": "dashboard",
        "description": "Listening-activity dashboard fed by the report marts.",
        "depends_on": [
            "rpt_artist_counts",
            "rpt_discovery_rate",
            "rpt_track_counts",
        ],
    },
}


def consumers() -> dict[str, list[str]]:
    """Inverted lineage: model -> everything that reads it (models and
    exposures) — the impact-analysis view (what breaks if this changes)."""
    out: dict[str, list[str]] = {name: [] for name in LINEAGE}
    for name, deps in LINEAGE.items():
        for dep in deps:
            out[dep].append(name)
    for exp_name, exp in EXPOSURES.items():
        for dep in exp["depends_on"]:
            out[dep].append(exp_name)
    return out


# Shared column glossary (the {% docs %} blocks): one definition, referenced
# by every model that carries the column.
_GLOSSARY: dict[str, str] = {
    "play_id": "Unique ID for this instance of listening history.",
    "track_id": "Unique ID for this track.",
    "album_id": "Unique ID for this album.",
    "artist_id": "Unique ID for the track's artist(s).",
    "track_name": "The track's title.",
    "album": "The track's album name.",
    "artists": "Comma-separated list of artists performing on the track.",
    "played_at": "UTC timestamp marking when the track was played.",
    "played_at_mtn": "Timestamp localized to America/Boise, marking when the track was played.",
    "duration_ms": "Track duration in milliseconds.",
    "total_plays": "Total times the track or artist has been recorded as played.",
    "dttm_first_played": "Date and time (America/Boise) the track or artist was first recorded as played.",
    "yr_first_played": "Year the track or artist was first recorded as played.",
    "wk_first_played": "Week (integer) the track or artist was first recorded as played.",
}

MODEL_DOCS: dict[str, dict] = {
    "stg_recent_tracks": {
        "description": "Staged listening history: one row per play, flattened from the API payload.",
        "columns": {
            "play_id": _GLOSSARY["play_id"],
            "track_id": _GLOSSARY["track_id"],
            "album_id": _GLOSSARY["album_id"],
            "artist_id": _GLOSSARY["artist_id"],
            "track_name": _GLOSSARY["track_name"],
            "track_album": _GLOSSARY["album"],
            "track_artists": _GLOSSARY["artists"],
            "played_at": _GLOSSARY["played_at"],
            "played_at_mtn": _GLOSSARY["played_at_mtn"],
            "duration_ms": _GLOSSARY["duration_ms"],
            "track_popularity": "Popularity 0-100; 100 is most popular (API metric).",
            "album_release_date": "Album release date; year-only values standardize to Jan 1.",
            "context": 'Play context: one of "album", "playlist", "artist", or null.',
        },
    },
    "dim_track": {
        "description": "Directory of all tracks observed. Each row is a track.",
        "columns": {
            "track_id": _GLOSSARY["track_id"],
            "track_name": _GLOSSARY["track_name"],
            "album_id": "Album ID corresponding to this track.",
            "album": _GLOSSARY["album"],
            "artists": _GLOSSARY["artists"],
            "duration_ms": _GLOSSARY["duration_ms"],
            "total_plays": _GLOSSARY["total_plays"],
            "dttm_first_played": _GLOSSARY["dttm_first_played"],
            "yr_first_played": _GLOSSARY["yr_first_played"],
            "wk_first_played": _GLOSSARY["wk_first_played"],
        },
    },
    "dim_artist": {
        "description": "Directory of artists observed. Each row is an artist or performing group.",
        "columns": {
            "artist_id": _GLOSSARY["artist_id"],
            "artists": _GLOSSARY["artists"],
            "total_plays": _GLOSSARY["total_plays"],
            "dttm_first_played": _GLOSSARY["dttm_first_played"],
            "yr_first_played": _GLOSSARY["yr_first_played"],
            "wk_first_played": _GLOSSARY["wk_first_played"],
        },
    },
    "dim_album": {
        "description": "Directory of all albums observed. Each row is an album.",
        "columns": {
            "album_id": _GLOSSARY["album_id"],
            "album": _GLOSSARY["album"],
            "release_date": "Album release date; year-only values standardize to Jan 1.",
        },
    },
    "fct_played_track": {
        "description": "Listening history fact. Each row is one played-track instance.",
        "columns": {
            "play_id": _GLOSSARY["play_id"],
            "track_id": _GLOSSARY["track_id"],
            "album_id": _GLOSSARY["album_id"],
            "played_at": _GLOSSARY["played_at"],
            "played_at_mtn": _GLOSSARY["played_at_mtn"],
            "track_popularity": "Popularity 0-100; 100 is most popular (API metric).",
            "context": 'Play context: one of "album", "playlist", "artist", or null.',
        },
    },
    "rpt_track_counts": {
        "description": "Most-played tracks over the trailing 30 days, with listening minutes.",
        "columns": {},
    },
    "rpt_artist_counts": {
        "description": "Most-played artists over the trailing 30 days, with listening minutes.",
        "columns": {},
    },
    "rpt_discovery_rate": {
        "description": "Weekly share of plays that are first-time tracks (discovery rate).",
        "columns": {},
    },
}
