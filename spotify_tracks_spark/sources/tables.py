"""Parquet table registry over the driver-provided testdata (TESTDATA.md).

Reads are plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into the scan (verify with ``.explain``: ``ReadSchema`` /
``PushedFilters``).  At 100 TB the same call reads a partitioned table root;
nothing here assumes single-file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import TESTDATA_TABLES


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read a testdata table.

    ``spread=True`` round-robin-repartitions up to the session's default
    parallelism when the scan yields fewer partitions — single-file parquet
    with one row group cannot be split, so compute-heavy per-row operators
    (shingle hashing, cosine scoring) would otherwise run on ONE core.  On a
    real cluster with many input files the partition count already exceeds
    the threshold and this is a no-op; the repartition is a tiny shuffle of
    the raw rows, repaid ~Ncores× in the downstream projection.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    df = _read_raw(spark, sf_dir, name)
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def normalize_events_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to microsecond ``TIMESTAMP``.

    Dtype-guarded so the same plan builds against any source layout; every
    events reader (batch and streaming) must route through this one helper:

    - ``timestamp[us]`` parquet (current testdata, read as TIMESTAMP_NTZ):
      cast NTZ→LTZ — identity on the underlying micros under the engine's
      pinned UTC session zone (session.py:48).
    - epoch-nanos ``bigint`` (TIMESTAMP(NANOS) parquet read with
      ``spark.sql.legacy.parquet.nanosAsLong``): *integer* division to
      micros (doubles lose precision above 2^53 — epoch-nanos are ~1.7e18).

    The output is always TimestampType, never NTZ: streaming watermarks
    reject NTZ event-time columns (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    and epoch arithmetic (cast to long / unix_micros) only resolves on LTZ.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Tolerate either timestamp[us] (current testdata) or TIMESTAMP(NANOS)
        # layouts: nanosAsLong only affects nanos columns, and the normalize
        # helper converts only when the read surfaces a bigint.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        return normalize_events_ts(raw)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
