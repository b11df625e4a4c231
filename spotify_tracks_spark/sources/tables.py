"""Parquet table registry over the driver-provided testdata (TESTDATA.md).

Reads are plain ``spark.read.parquet`` — Catalyst handles column pruning and
predicate pushdown into the scan (verify with ``.explain``: ``ReadSchema`` /
``PushedFilters``).  At 100 TB the same call reads a partitioned table root;
nothing here assumes single-file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import TESTDATA_TABLES


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
