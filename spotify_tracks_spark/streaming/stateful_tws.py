"""Gap-based sessionization on Spark 4's ``transformWithStateInPandas`` —
the engine's second custom-stateful-operator implementation, on the
successor API to ``applyInPandasWithState`` (streaming/stateful.py).

Same semantics as stateful.py's flush-tail variant (and the same DuckDB
oracle: the batch window-function sessionization), different state
machinery: a ``StatefulProcessor`` with a typed ``ValueState`` backed by
the RocksDB state store provider.  What the new API buys at scale:

- RocksDB state: per-key state lives off-heap and spills to disk —
  executor memory bounds the *working set*, not the keyspace (the
  difference between O(active users) and O(heap) sessionization);
  changelog checkpointing ships deltas, not full snapshots.
- Typed state primitives (value/list/map state per key) instead of one
  opaque tuple, and a timer facility for wall/event-time session timeouts
  (a continuous deployment would register a timer at ``end + gap`` and
  emit on expiry instead of flushing per drain).

The processor accumulates each key's micro-batch rows, merges with the
open tail carried in ``ValueState``, closes sessions at >gap quiet
periods, and (flush variant) emits the open tail at the end of each
batch — so an availableNow drain equals the batch sessionization,
hash-checkable like any batch query.

Environment gate: the transformWithState Python runner speaks protobuf to
the JVM state server, so running this operator requires the ``protobuf``
package — absent in this container (no installs).  The module imports
cleanly without it; the correctness test skips when protobuf is missing,
and the driver-run query surface uses the applyInPandasWithState
implementation (stateful.py) instead.

Probe result (round 3): ``import google.protobuf`` raises
ModuleNotFoundError — neither ``protobuf`` nor any ``google`` namespace
package is present, and installs are disallowed, so the gate stands:
verified-impossible in this container, exercised by the skip-gated test
only.

Probe result (round 7, exhaustive): ``import google.protobuf`` still
ModuleNotFoundError; ``pip download protobuf --no-deps`` fails with
``NewConnectionError: [Errno -2] Name or service not known`` (no
network route to any index), and a filesystem sweep finds only typeshed
STUBS (``jedi/third_party/typeshed/stubs/protobuf`` — type annotations,
no runtime), no vendorable wheel or site-packages copy anywhere on
disk.  Unlock recipe for a real cluster: ``pip install 'protobuf>=4'``
matches this pyspark 4.1 dist's generated ``*_pb2.py`` modules; the
gated test (tests/test_streaming.py::test_stream_sessionize_tws_matches_batch)
then pins TWS hash-equal to the applyInPandasWithState sessionization.

CLOSED PERMANENTLY (round 10): one final pinned attempt —
``pip install protobuf`` → NewConnectionError (no DNS route to the
index), ``import google.protobuf`` → ModuleNotFoundError.  Per the
round-9 verdict this is now documented as a permanent environment
limitation in README §Limitations and is no longer tracked as a
residual; the skip-gated test remains the unlock path on a real
cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..sources.tables import normalize_events_ts

GAP_MINUTES = 30

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("count", T.LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SessionizeProcessor(StatefulProcessor):
    """Flush-tail gap sessionizer (drain-total; see module docstring)."""

    def __init__(self, flush_tail: bool = True, gap_minutes: int = GAP_MINUTES):
        self._flush_tail = flush_tail
        self._gap_s = gap_minutes * 60

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._tail = handle.getValueState("open_session", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend(int(t.value) // 1_000 for t in pdf["ts"])
        ts_us.sort()

        start = end = count = None
        if self._tail.exists():
            start, end, count = self._tail.get()

        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if start is None:
                start, end, count = t, t, 1
            elif t // 1_000_000 - end // 1_000_000 > self._gap_s:
                closed.append((user_id, start, end, count))
                start, end, count = t, t, 1
            else:
                end, count = max(end, t), count + 1

        if start is not None:
            if self._flush_tail:
                closed.append((user_id, start, end, count))
                self._tail.clear()
            else:
                self._tail.update((start, end, count))
        if not closed:
            return iter(())
        out = pd.DataFrame(closed, columns=["user_id", "start_us", "end_us", "n_events"])
        out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
        out["session_end"] = pd.to_datetime(out.pop("end_us"), unit="us")
        return iter([out[["user_id", "session_start", "session_end", "n_events"]]])

    def close(self) -> None:
        pass


def stream_sessionize_tws(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    glob: str = "events.parquet",
    flush_tail: bool = True,
) -> DataFrame:
    """Run transformWithStateInPandas sessionization over a parquet stream
    (availableNow) and return the emitted sessions as a batch DataFrame."""
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.option("pathGlobFilter", glob).parquet(src_dir).schema

    prior_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prior_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # transformWithState requires the RocksDB provider; scoped to this query
    # (the setting binds at stream start and persists in the checkpoint)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    out_dir = tempfile.mkdtemp(prefix="stream_tws_out_")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", glob)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        sessions = (
            normalize_events_ts(stream)
            .select("user_id", "ts")
            .groupBy("user_id")
            .transformWithStateInPandas(
                SessionizeProcessor(flush_tail=flush_tail),
                outputStructType=OUT_SCHEMA,
                outputMode="append",
                timeMode="none",
            )
        )
        (
            sessions.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior_parts)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prior_provider
        )
    return spark.read.parquet(out_dir)
