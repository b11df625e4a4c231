"""Deterministic testdata → ``src_recent_tracks`` mapping.

The correctness gate runs over the driver's TPC-H-ish parquet (TESTDATA.md),
but the reference's declared queries (SURVEY.md §2.1) are defined over a
9-column track-play event log.  This module derives that log from the
testdata with a pure, engine-portable expression set — the *same* rows come
out of Spark and of the DuckDB oracle (``oracles.SRC_CTES``), so the entire
8-model chain is hash-checkable end to end.

Role mapping (FIXTURES.md §3):  ``lineitem`` = play-grain fact (one play per
line item), ``part`` = track directory.  Column derivations are chosen to
exercise every staging edge case from FIXTURES.md §1: all three
release-date precisions (incl. the unhandled-``month``→NULL CASE hole),
NULL popularity/context, duration conflicts per track, and multi-artist
comma-joined sets.

The final dedup-on-play-identity window reproduces the reference's
idempotent-sink semantics (``ON CONFLICT DO NOTHING``,
flows/pull_recent_tracks.py:225): the physical table holds one row per
(track_name, track_album, track_artists, played_at).  Arrival order is not
reproducible from static testdata, so "first writer wins" becomes a
deterministic total order (min duration, then context) — identical in the
oracle.

Scale notes: the lineitem⋈part join broadcasts ``part`` (dim ≪ fact; AQE
picks broadcast-hash automatically, asserted in tests).  The dedup window
shuffles once on the play key — the same shuffle the downstream ``play_id``
aggregations reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tables import read_table


def src_recent_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 9-column source event log (see ``schemas.SRC_RECENT_TRACKS``)."""
    # spread: single-file lineitem can't split, and everything up to the
    # dedup shuffle (broadcast probe, date formatting, partial agg) would
    # otherwise run in ONE scan task.
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate"
    )
    part = read_table(spark, sf_dir, "part")
    base = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)

    # Pre-aggregation rows carry only the COMPACT determinants: every
    # payload column (release date, precision, popularity, context,
    # duration) is a pure function of (p_partkey, l_orderkey, duration_ms),
    # so the dedup shuffle moves 3 numbers per row instead of 5 derived
    # strings — the string rendering happens once per surviving key, after
    # the exchange.
    raw = base.select(
        F.col("p_partkey"),
        F.col("l_orderkey"),
        F.col("p_name").alias("track_name"),
        F.col("p_brand").alias("track_album"),
        # p_type words become a comma-joined "artist set" — collaborations
        # share artist names across sets (FIXTURES.md §1 row 3).
        F.replace(F.col("p_type"), F.lit(" "), F.lit(", ")).alias("track_artists"),
        # l_shipdate is a whole-second TIMESTAMP, so the plain string cast
        # renders exactly date_format's "yyyy-MM-dd HH:mm:ss" without the
        # DateTimeFormatter (~2x cheaper on the hot path)
        F.col("l_shipdate").cast("string").alias("played_at"),
        (F.lit(30000) + F.floor("l_extendedprice").cast("long") % 570001)
        .cast("double")
        .alias("duration_ms"),
    )

    # Idempotent-sink semantics: one row per play-identity key
    # (stg_recent_tracks.sql:2-6), deterministic winner = the row minimizing
    # (duration_ms, context, p_partkey) — a TOTAL order (partkey is unique
    # per source part), so the pick is reproducible in both engines even if
    # two distinct parts collide on the play key.  min_by is an aggregate
    # (map-side partial combine: only unique play keys shuffle — the shape
    # that survives 100 TB).  The NULLS-LAST string order on context
    # ('album' < 'artist' < 'playlist' < '~') is mapped to an integer
    # ordinal of l_orderkey % 4 (0→album, 2→artist, 1→playlist, 3→NULL) so
    # the ordering struct is all-numeric.
    ok4 = F.col("l_orderkey") % 4
    ctx_ord = (
        F.when(ok4 == 0, F.lit(0))
        .when(ok4 == 2, F.lit(1))
        .when(ok4 == 1, F.lit(2))
        .otherwise(F.lit(3))
    )
    winner = F.min_by(
        F.struct("p_partkey", "l_orderkey", "duration_ms"),
        F.struct("duration_ms", ctx_ord.alias("_ctx_ord"), "p_partkey"),
    ).alias("w")

    wpk = F.col("w.p_partkey")
    w_rd_year = F.lit(1990) + wpk % 30
    w_rd_month = F.lit(1) + wpk % 12
    w_rd_day = F.lit(1) + wpk % 28
    w_ok4 = F.col("w.l_orderkey") % 4
    return (
        raw.groupBy("track_name", "track_album", "track_artists", "played_at")
        .agg(winner)
        .select(
            "track_name",
            "track_album",
            "track_artists",
            # make_date + cast renders the same zero-padded strings as
            # format_string("%04d-%02d-%02d"/"%04d-%02d"/"%04d") for the
            # generated ranges (years 1990-2019 are always 4 digits) without
            # java.util.Formatter
            F.when(wpk % 3 == 0, F.make_date(w_rd_year, w_rd_month, w_rd_day).cast("string"))
            .when(wpk % 3 == 1, w_rd_year.cast("string"))
            .otherwise(F.substring(F.make_date(w_rd_year, w_rd_month, F.lit(1)).cast("string"), 1, 7))
            .alias("album_release_date"),
            F.when(wpk % 3 == 0, F.lit("day"))
            .when(wpk % 3 == 1, F.lit("year"))
            .otherwise(F.lit("month"))
            .alias("release_date_precision"),
            F.when(wpk % 7 == 0, F.lit(None).cast("double"))
            .otherwise((wpk % 101).cast("double"))
            .alias("track_popularity"),
            "played_at",
            F.when(w_ok4 == 0, F.lit("album"))
            .when(w_ok4 == 1, F.lit("playlist"))
            .when(w_ok4 == 2, F.lit("artist"))
            .otherwise(F.lit(None).cast("string"))
            .alias("context"),
            F.col("w.duration_ms").alias("duration_ms"),
        )
    )
