"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (rpt_track_counts: the longest dependency
chain, SURVEY.md §7.1) on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data extensions; oracle SQL mirrors each
Spark plan byte-exactly (see spotify_tracks_spark/oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spotify_tracks_spark import oracles
from spotify_tracks_spark.pipeline import run_models


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return run_models(spark, "/root/testdata/sf0.001")["rpt_track_counts"]


def _model(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_models(spark, sf_dir)[name]

    return q


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "q1_stg_recent_tracks": _model("stg_recent_tracks"),
        "q2_dim_track": _model("dim_track"),
        "q3_dim_artist": _model("dim_artist"),
        "q4_dim_album": _model("dim_album"),
        "q5_fct_played_track": _model("fct_played_track"),
        "q6_rpt_track_counts": _model("rpt_track_counts"),
        "q7_rpt_artist_counts": _model("rpt_artist_counts"),
        "q8_rpt_discovery_rate": _model("rpt_discovery_rate"),
    }
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "q1_stg_recent_tracks": oracles.Q1_STG,
        "q2_dim_track": oracles.Q2_DIM_TRACK,
        "q3_dim_artist": oracles.Q3_DIM_ARTIST,
        "q4_dim_album": oracles.Q4_DIM_ALBUM,
        "q5_fct_played_track": oracles.Q5_FCT,
        "q6_rpt_track_counts": oracles.Q6_RPT_TRACK_COUNTS,
        "q7_rpt_artist_counts": oracles.Q7_RPT_ARTIST_COUNTS,
        "q8_rpt_discovery_rate": oracles.Q8_RPT_DISCOVERY_RATE,
    }
