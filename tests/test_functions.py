"""Expression-kernel unit tests — byte-exact parity vectors.

Every downstream hash depends on these helpers, so they are pinned against
known values (md5 computed independently) and DuckDB-checked semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row, functions as F

from spotify_tracks_spark.functions import (
    portable_hash60,
    safe_divide,
    surrogate_key,
    to_local_wallclock,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_surrogate_key_known_vector(spark):
    # dbt_utils.generate_surrogate_key(['a','b']) on values a=x, b=y
    expected = hashlib.md5(b"x-y").hexdigest()
    df = spark.createDataFrame([Row(a="x", b="y")])
    assert df.select(surrogate_key("a", "b").alias("k")).collect()[0].k == expected


def test_surrogate_key_null_sentinel(spark):
    expected = hashlib.md5(b"x-_dbt_utils_surrogate_key_null_").hexdigest()
    df = spark.createDataFrame([Row(a="x", b=None)], "a string, b string")
    assert df.select(surrogate_key("a", "b").alias("k")).collect()[0].k == expected


def test_surrogate_key_casts_nonstring(spark):
    # doubles render like DuckDB varchar casts: 42.0 -> '42.0'
    expected = hashlib.md5(b"42.0").hexdigest()
    df = spark.createDataFrame([Row(a=42.0)])
    assert df.select(surrogate_key("a").alias("k")).collect()[0].k == expected


def test_safe_divide_zero_and_null(spark):
    df = spark.createDataFrame([Row(n=6.0, d=3.0), Row(n=1.0, d=0.0), Row(n=1.0, d=None)])
    out = [r.v for r in df.select(safe_divide(F.col("n"), F.col("d")).alias("v")).collect()]
    assert out == [2.0, None, None]


def test_boise_wallclock_dst_boundaries(spark):
    # March 2nd-Sunday spring-forward (2001-04-01 in 2001? No — 2001 DST began
    # April 1).  Use fixed instants with independently-known offsets:
    # winter MST=UTC-7, summer MDT=UTC-6.
    rows = [
        Row(ts="2001-01-15 12:00:00", want="2001-01-15 05:00:00"),  # MST
        Row(ts="2001-07-15 12:00:00", want="2001-07-15 06:00:00"),  # MDT
        # 2001 spring-forward: Apr 1 02:00 local; 08:59 UTC is still MST
        Row(ts="2001-04-01 08:59:00", want="2001-04-01 01:59:00"),
        Row(ts="2001-04-01 09:00:00", want="2001-04-01 03:00:00"),  # 02:00→03:00 skip
        # 2001 fall-back: Oct 28 02:00 local
        Row(ts="2001-10-28 07:59:00", want="2001-10-28 01:59:00"),  # MDT
        Row(ts="2001-10-28 08:00:00", want="2001-10-28 01:00:00"),  # repeated hour, MST
    ]
    df = spark.createDataFrame(rows)
    out = df.select(
        F.date_format(to_local_wallclock(F.col("ts").cast("timestamp")), "yyyy-MM-dd HH:mm:ss").alias("got"),
        "want",
    ).collect()
    for r in out:
        assert r.got == r.want, (r.got, r.want)


def test_iso_week_year_boundary(spark):
    # Calendar year + ISO week: the reference's deliberate mismatch (§7.4).
    df = spark.createDataFrame([Row(d="2025-12-29"), Row(d="2026-01-01"), Row(d="2027-01-01")])
    out = df.select(
        F.year(F.col("d").cast("date")).alias("y"),
        F.weekofyear(F.col("d").cast("date")).alias("w"),
    ).collect()
    assert [(r.y, r.w) for r in out] == [(2025, 1), (2026, 1), (2027, 53)]


def test_portable_hash60_matches_duckdb(spark):
    import duckdb

    vals = ["", "abc", "hello world", "0|shingle"]
    got = {
        r.s: r.h
        for r in spark.createDataFrame([Row(s=v) for v in vals])
        .select(F.col("s"), portable_hash60(F.col("s")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.execute("select ('0x' || substr(md5(?),1,15))::bigint", [v]).fetchone()[0]
        assert got[v] == want, v
