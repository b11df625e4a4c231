"""Model DAG runner — the engine's equivalent of ``dbt build``.

Dependency order is the reference's 3-level DAG (SURVEY.md §2.11):
stg → {dim_track, dim_artist, dim_album, fct} → {rpt_*}.  Staging is read by
six downstream models, so it is materialized once (``.cache()`` locally; a
written table on a cluster) instead of recomputed per consumer — the one
memoization the reference gets from dbt table materialization
(SURVEY.md §4).

``run_models`` returns every model as a DataFrame dict; ``write_models``
persists them as parquet with the 100 TB layout: the fact partitioned by
play date (partition pruning for the trailing-window reports), dims plain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import RUN_DATE
from .sources.mapping import src_recent_tracks
from .plans import (
    stg_recent_tracks,
    dim_track,
    dim_artist,
    dim_album,
    fct_played_track,
    rpt_track_counts,
    rpt_artist_counts,
    rpt_discovery_rate,
)


# Memoized model DAGs keyed by (session, sf_dir, run_date).  The reference
# materializes staging as a table read by six downstream models (dbt table
# materialization, SURVEY.md §4); our equivalent is building the shared DAG
# once per session+dataset so ``stg``/``dim_track`` caches are reused across
# the driver's independent per-query calls instead of recomputed eight times.
_MEMO: dict[tuple[int, str, str, bool], dict[str, DataFrame]] = {}


def run_models(
    spark: SparkSession, sf_dir: str, run_date: str = RUN_DATE, cache: bool = True
) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir, run_date, cache)
    if key in _MEMO:
        return _MEMO[key]
    models = _build_models(spark, sf_dir, run_date, cache)
    _MEMO[key] = models
    return models


def _build_models(
    spark: SparkSession, sf_dir: str, run_date: str, cache: bool
) -> dict[str, DataFrame]:
    src = src_recent_tracks(spark, sf_dir)
    stg = stg_recent_tracks(src)
    if cache:
        stg = stg.cache()
    dt = dim_track(stg)
    da = dim_artist(stg)
    dal = dim_album(stg)
    fct = fct_played_track(stg)
    if cache:
        dt = dt.cache()
    return {
        "stg_recent_tracks": stg,
        "dim_track": dt,
        "dim_artist": da,
        "dim_album": dal,
        "fct_played_track": fct,
        "rpt_track_counts": rpt_track_counts(fct, dt, dal, run_date),
        "rpt_artist_counts": rpt_artist_counts(fct, dt, run_date),
        "rpt_discovery_rate": rpt_discovery_rate(fct, dt, da),
    }


def write_models(models: dict[str, DataFrame], out_dir: str) -> dict[str, int]:
    """Write every model; returns per-model row counts measured by the
    ``Observation`` API — metrics piggyback on the write job itself (the
    executor-side accumulator fills as rows stream to parquet), so the
    counts that feed run logs / freshness checks cost ZERO extra passes.
    At 100 TB a post-write ``count()`` is a second full scan; this is the
    difference between free telemetry and doubling the pipeline's I/O."""
    from pyspark.sql import Observation

    counts: dict[str, int] = {}
    for name, df in models.items():
        obs = Observation(f"write_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.mode("overwrite")
        if name == "fct_played_track":
            # 100 TB layout: date-partitioned fact → the 30-day reports prune
            # to ~1/80th of the table before any shuffle.
            df = df.withColumn("play_date", F.to_date("played_at"))
            writer = df.repartition("play_date").write.mode("overwrite").partitionBy("play_date")
        writer.parquet(f"{out_dir}/{name}")
        counts[name] = obs.get["rows"]
    return counts


def write_models_bucketed(
    models: dict[str, DataFrame],
    out_dir: str,
    database: str = "spotify_bucketed",
    n_buckets: int = 16,
) -> None:
    """Co-located join layout: fact and track dim CLUSTERED BY ``track_id``
    into the same bucket count (SURVEY.md §7.2 item 8: "bucket by
    track_id").

    Every recurring fct⋈dim_track join (Q6/Q7/Q8 and any ad-hoc per-track
    analysis) then matches bucket-to-bucket with NO exchange on either
    side — at 100 TB that deletes the single largest shuffle in the
    workload from every downstream run, paid for by one bucketed write.
    Broadcast covers today's small dims; bucketing is what survives when
    the probe side is another fact-sized table (plays⋈plays cohort joins)
    or the dim outgrows the broadcast threshold.  Verified by a plan test:
    SortMergeJoin over the two bucketed scans with zero Exchange nodes
    (tests/test_models.py).

    Buckets are external tables (explicit ``path``) so the parquet layout
    is inspectable; bucket metadata lives in the session catalog exactly
    as it would in a production Hive/Glue/Unity metastore."""
    spark = models["fct_played_track"].sparkSession
    spark.sql(f"create database if not exists {database}")
    for name in ("fct_played_track", "dim_track"):
        (
            models[name]
            .write.mode("overwrite")
            .bucketBy(n_buckets, "track_id")
            .sortBy("track_id")
            .option("path", f"{out_dir}/{name}")
            .saveAsTable(f"{database}.{name}")
        )
