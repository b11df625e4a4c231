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


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects outright; read nanos as long and convert to a
        # microsecond timestamp with *integer* division (doubles lose
        # precision above 2^53 — epoch-nanos are ~1.7e18).  Values in this
        # dataset are µs-exact, so the conversion is lossless and matches
        # DuckDB's TIMESTAMP read bit-for-bit.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
