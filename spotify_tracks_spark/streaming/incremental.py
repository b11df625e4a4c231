"""Streaming-incremental mart maintenance — ``dim_track`` kept up to date
per micro-batch instead of rebuilt from scratch.

The reference rebuilds every mart twice daily (full CTAS,
flows/dbt_build_and_load_turso.py:41,182); SURVEY.md §2.9 notes
streaming-incremental marts are the optimization, not the contract.  This
operator IS that optimization, expressed the Structured Streaming way:
``foreachBatch`` folds each micro-batch of source rows into a running
per-track state table, and a drained run hash-matches the *batch* Q2
oracle — incremental view maintenance with the full-rebuild result as its
correctness contract.

Why this works: every dim_track output column is derivable from
associative, commutative partial aggregates —

- ``total_plays``   = sum of per-batch counts,
- ``dttm_first_played`` = min of per-batch mins,
- ``duration_ms``   = max of per-batch maxes (the reference's conflict
  resolution, dim_track.sql:14-21),
- attribute columns (album/name/artists) are functionally dependent on
  ``track_id`` (they feed its surrogate key), so min = the value —

so ``merge(state, batch) = re-aggregate(state ∪ partial(batch))`` needs no
replay and no per-play state.  State cardinality is one row per *track*
(entity count, ≪ play count); each batch shuffles only its own partials
plus the state — at 100 TB this is the difference between touching the
whole fact table twice a day and touching one day of increments.

The state table double-buffers between two parquet dirs (read prev, write
next) — the single-process analog of a transactional table format's
snapshot swap; Delta/Iceberg MERGE would replace the swap on a real
deployment without changing the dataflow.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.staging import stg_recent_tracks
from ..sources.mapping import src_recent_tracks

N_SLICES = 2

_ATTRS = ("album_id", "album", "track_name", "artists")


def _partials(stg: DataFrame) -> DataFrame:
    """Per-track partial aggregates of one micro-batch of staged plays."""
    return stg.groupBy("track_id").agg(
        F.min("album_id").alias("album_id"),
        F.min("track_album").alias("album"),
        F.min("track_name").alias("track_name"),
        F.min("track_artists").alias("artists"),
        F.count("*").alias("total_plays"),
        F.min("played_at_mtn").alias("dttm_first_played"),
        F.max("duration_ms").alias("duration_ms"),
    )


def _remerge(u: DataFrame) -> DataFrame:
    """Fold state ∪ partials back to one row per track (associative)."""
    return u.groupBy("track_id").agg(
        *[F.min(a).alias(a) for a in _ATTRS],
        F.sum("total_plays").alias("total_plays"),
        F.min("dttm_first_played").alias("dttm_first_played"),
        F.max("duration_ms").alias("duration_ms"),
    )


def stream_dim_track_incremental(
    spark: SparkSession, sf_dir: str, n_slices: int = N_SLICES
) -> DataFrame:
    """Maintain dim_track incrementally over a micro-batched source stream
    (availableNow drain) and return the final mart — hash-equal to the
    batch ``dim_track`` (same Q2 oracle)."""
    base = tempfile.mkdtemp(prefix="incr_dim_")
    src_path = f"{base}/src"
    # Materialize the deduped source log sliced into n files; one file per
    # micro-batch stands in for one ingest window's arrivals.
    src_recent_tracks(spark, sf_dir).repartition(n_slices).write.parquet(src_path)
    schema = spark.read.parquet(src_path).schema

    state_dirs = [f"{base}/state0", f"{base}/state1"]
    cur = {"i": -1}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = _partials(stg_recent_tracks(batch_df))
        if cur["i"] >= 0:
            prev = spark.read.parquet(state_dirs[cur["i"]])
            partial = prev.unionByName(partial)
        merged = _remerge(partial)
        nxt = (cur["i"] + 1) % 2
        merged.write.mode("overwrite").parquet(state_dirs[nxt])
        cur["i"] = nxt

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)

    state = spark.read.parquet(state_dirs[cur["i"]])
    first_date = F.col("dttm_first_played").cast("date")
    return state.select(
        "track_id",
        "album_id",
        "album",
        "track_name",
        "artists",
        "total_plays",
        "dttm_first_played",
        F.year(first_date).cast("long").alias("yr_first_played"),
        F.weekofyear(first_date).cast("long").alias("wk_first_played"),
        "duration_ms",
    )
