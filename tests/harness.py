"""Spark-vs-DuckDB comparison harness, mimicking the driver's t2 gate:
row count + schema + order-insensitive, column-name-sorted value hash."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.6f}"
    if isinstance(v, (dt.date, dt.datetime, pd.Timestamp)):
        # DuckDB fetchdf renders DATE as midnight datetime64; Spark gives
        # datetime.date — canonicalize both to a full timestamp string.
        return pd.Timestamp(v).isoformat(sep=" ")
    return str(v)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    odf = duckdb_run(oracle_sql, sf_dir)
    if len(spdf) != len(odf):
        return False, f"row count: spark={len(spdf)} oracle={len(odf)}"
    if sorted(spdf.columns) != sorted(odf.columns):
        return False, f"columns: spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}"
    a, b = canonical_rows(spdf), canonical_rows(odf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spdf)} rows)"
