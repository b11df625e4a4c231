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
