"""Stream-stream interval join — click→purchase attribution, the
Structured Streaming join shape a real-time events pipeline needs.

Both sides are watermarked streams of the same events source (filtered to
one event_type each); the join is an equi-join on ``user_id`` with an
event-time interval bound (click within the hour before the purchase).
Append mode + availableNow drain emits every matching pair exactly once,
so the total output equals the equivalent batch self-join — which is
exactly the DuckDB oracle used to check it.

Scale shape: state shards by the join key (user_id hash) across
executors.  The watermark + time-range condition lets Spark expire
buffered rows on BOTH sides (a click older than watermark + 1 h can never
match a future purchase), so state is bounded by the event rate within
the watermark horizon, not the stream length — the difference between a
join that runs forever and one that OOMs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.time_utils import epoch_micros
from ..sources.tables import normalize_events_ts

MAX_LAG = "1 hour"
WATERMARK = "1 day"

_COUNTER = iter(range(1_000_000))


def stream_click_purchase_join(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Purchases joined to same-user clicks in the preceding hour
    (availableNow drain); returns the emitted pairs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    name = f"ssj_{next(_COUNTER)}"

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            normalize_events_ts(
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", watermark)
        )

    try:
        joined = (
            side("purchase", "purchase")
            .join(
                side("click", "click"),
                F.expr(
                    "purchase_user = click_user"
                    " AND click_ts >= purchase_ts - interval 1 hour"
                    " AND click_ts <= purchase_ts"
                ),
                "inner",
            )
            .select(
                "purchase_id",
                "click_id",
                F.col("purchase_user").alias("user_id"),
                "purchase_ts",
                "click_ts",
                (
                    epoch_micros(F.col("purchase_ts")) - epoch_micros(F.col("click_ts"))
                ).alias("lag_us"),
            )
        )
        (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ssj_ckpt_"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.table(name)
