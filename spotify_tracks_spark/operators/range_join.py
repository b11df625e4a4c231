"""Range (interval) join — the second join shape Spark's equi-join engine
lacks, implemented with the bin-bucketing pattern that scales past
broadcast.

Naive ``left.value BETWEEN r.lo AND r.hi`` compiles to a nested-loop join
— O(|L|·|R|), only viable when one side broadcasts.  The scalable form
buckets the value domain into fixed-width bins: each interval explodes to
the bins it overlaps, each row maps to exactly one bin, and the match
becomes an EQUI-join on bin id plus a residual predicate.  Cost:
O(|L| + |R|·span/width) shuffled on an integer key — both sides can be
arbitrarily large, skewed bins are AQE-split.

``events_value_bands`` bands every event's ``value``; the oracle is the
plain theta-join SQL, so the binned rewrite must reproduce the naive
semantics exactly (half-open [lo, hi) intervals; events outside every
band drop out, matching the inner theta join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import read_table

# (band, lo, hi) — half-open [lo, hi); spans differ so intervals explode
# to different bin counts.
VALUE_BANDS: tuple[tuple[str, float, float], ...] = (
    ("nano", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("medium", 50.0, 150.0),
    ("large", 150.0, 400.0),
    ("huge", 400.0, 2000.0),
)
BIN_WIDTH = 25.0


def range_join_binned(
    left: DataFrame,
    val_col: str,
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = BIN_WIDTH,
) -> DataFrame:
    """Inner range join: rows of ``left`` matched to intervals containing
    ``val_col`` (half-open [lo, hi)) via bin-bucketed equi-join."""
    binned_intervals = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                # hi is exclusive: a hi exactly on a bin edge does not reach
                # into the next bin
                F.floor((F.col(hi_col) - 1e-9) / bin_width),
            )
        ).alias("_bin"),
    )
    binned_left = left.withColumn("_bin", F.floor(F.col(val_col) / bin_width))
    return (
        binned_left.join(binned_intervals, "_bin")
        .filter((F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col)))
        .drop("_bin")
    )


def events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band every event's value via the binned range join."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    bands = spark.createDataFrame(list(VALUE_BANDS), "band: string, lo: double, hi: double")
    return range_join_binned(ev, "value", bands).select(
        "event_id", "event_type", "value", "band", "lo", "hi"
    )
