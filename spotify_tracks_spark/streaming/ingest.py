"""Structured Streaming ingest — the explicit version of the reference's
operational micro-batching (SURVEY.md §2.9).

The reference polls an at-least-once source on a cron and relies on
``ON CONFLICT DO NOTHING`` for effective exactly-once.  The Spark-native
mapping:

- ``readStream`` over the source (file source here; the REST adapter in
  ``sources/rest.py`` plays the driver-side role in batch mode);
- ``withWatermark`` sized to the redelivery window (the API's ≤50-item
  overlap ⇒ 1 day is generous) bounds the dedup state store;
- ``dropDuplicates([key])`` within the watermark;
- ``foreachBatch`` + ``append_if_absent`` makes the sink idempotent across
  restarts (at-least-once micro-batches → exactly-once table effect);
- ``trigger(availableNow=True)`` = the cron-run semantics: drain what's
  available, checkpoint, exit.

At scale: the state store shards by key hash across executors; the
watermark keeps it bounded to ~1 day of keys; the foreachBatch anti-join
shuffles only the micro-batch (small) against the sink's key index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.idempotent_sink import append_if_absent
from ..sources.tables import normalize_events_ts


def stream_events_dedup(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    key: str = "event_id",
    within_watermark: bool = False,
) -> DataFrame:
    """Run the streaming ingest over the events table (availableNow) and
    return the resulting deduplicated sink table as a batch DataFrame.

    ``within_watermark=True`` swaps ``dropDuplicates`` for
    ``dropDuplicatesWithinWatermark``: the successor API whose state
    eviction is *guaranteed* by contract (a key expires once the watermark
    passes its first-seen event time) instead of by the implicit
    dropDuplicates+watermark interaction — the call a long-running
    deployment should make.  Identical drained result here (the testdata
    has no cross-watermark duplicate keys), same oracle."""
    # `ts` is normalized to a microsecond timestamp before the watermark via
    # the shared dtype-guarded helper (sources/tables.py) — a no-op for the
    # timestamp[us] testdata, a lossless integer conversion for nanos-as-long.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    # The dedup state store shards by spark.sql.shuffle.partitions, fixed
    # into the checkpoint at first batch.  A single-source availableNow run
    # doesn't need the batch-width default (32): 8 shards cut state-store
    # checkpoint/commit overhead ~4× here.  A continuous 100 TB deployment
    # sizes this to (executors × cores) instead — it is per-checkpoint
    # immutable either way, so it must be set before .start().
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    marked = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).withWatermark("ts", watermark)
    stream = (
        marked.dropDuplicatesWithinWatermark([key])
        if within_watermark
        else marked.dropDuplicates([key])
    )

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        spark_ = batch.sparkSession
        try:
            existing = spark_.read.parquet(out_dir)
        except Exception:  # first batch: empty sink
            existing = spark_.createDataFrame([], batch.schema)
        fresh = append_if_absent(existing, batch, [key])
        fresh.write.mode("append").parquet(out_dir)

    try:
        (
            stream.writeStream.foreachBatch(sink_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.read.parquet(out_dir)
