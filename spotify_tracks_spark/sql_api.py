"""SQL interface — the engine's marts as a ``spark.sql`` surface.

The reference's consumers query its marts with SQL (the dashboard exposure,
`dbt_spotify/models/marts/_spotify__exposures.yml`); this module gives the
same experience on the Spark side: every model registered as a temp view,
ad-hoc ANSI SQL over them via ``spark.sql`` — same Catalyst plans as the
DataFrame API, so nothing is lost by choosing SQL.

``sql_top_artists`` is the oracle-checked proof query: a mart-over-mart
SQL join/aggregate that a dashboard would issue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .pipeline import run_models


def register_models(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every model as a temp view (idempotent); returns names."""
    models = run_models(spark, sf_dir)
    for name, df in models.items():
        df.createOrReplaceTempView(name)
    return list(models)


def sql_top_artists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc SQL over registered marts: lifetime plays + minutes per
    artist set (each play billed the track's resolved max duration).

    Float discipline as in plans/reports.py: durations are integral, so
    sum exact integers first, then two IEEE divisions — bit-identical in
    any engine/partitioning."""
    register_models(spark, sf_dir)
    return spark.sql(
        """
        select dt.artists,
               count(*) as plays,
               cast(sum(cast(dt.duration_ms as bigint)) as double) / 1000 / 60
                 as minutes_played
        from fct_played_track f
        join dim_track dt on f.track_id = dt.track_id
        group by dt.artists
        """
    )


N_HASH_BUCKETS = 16


def sql_udf_user_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF registration — the API class the reference's SQL surface
    lacks entirely (SURVEY.md §2.10: no UDF registration): a scalar
    function declared with ``CREATE TEMPORARY FUNCTION ... RETURN
    <expr>`` (declarative SQL UDF) and used from plain
    ``spark.sql``.  The body is the engine-portable 60-bit hash, so the
    whole query stays JVM-side and codegen'd — a SQL UDF is a named
    expression, NOT a Python round-trip, which is why it's the right
    way to share logic on the SQL surface at scale.

    The query itself is the hash-bucketing every salting/sharding knob
    builds on: events bucketed by h60(user_id) mod N, with per-bucket
    event and user counts (near-uniform buckets = the hash is usable as
    a shard key).

    Output: (bucket, n_events, n_users)."""
    from .sources.tables import read_table

    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION h60(s STRING) RETURNS BIGINT
        RETURN cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)
        """
    )
    read_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        f"""
        select pmod(h60(cast(user_id as string)), {N_HASH_BUCKETS}) as bucket,
               count(*) as n_events,
               count(distinct user_id) as n_users
        from events_v
        group by 1
        """
    )
