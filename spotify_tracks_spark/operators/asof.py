"""As-of (point-in-time) join — an operator Spark's join syntax lacks,
composed from built-ins: for each left row, attach the payload of the
*latest* right row with ``right.ts <= left.ts`` in the same key group.

Implementation is the canonical distributed as-of: union both sides with a
side tag, one shuffle on the group key, then ``last(payload,
ignorenulls=True)`` over a (ts, side) ordered running window — right rows
sort before left rows at equal ts, so an exact-ts right row matches.  The
right payload travels inside a struct so NULL payload *fields* survive
(``ignorenulls`` skips only whole missing rows).

Scale shape: ONE shuffle of |L|+|R| narrow rows on the group key + a
per-partition sort — the same cost as a single window function; no
range-explosion, no per-row subquery.  This beats the broadcast-range-join
alternative whenever the right side is too big to broadcast, and both
sides arrive already bucketed by the key on a production table layout.

The DuckDB oracle uses its *native* ``ASOF LEFT JOIN`` — two independent
implementations of the semantics that must hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.time_utils import epoch_micros
from ..sources.tables import read_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + ``payload_cols`` of the latest
    ``right`` row at-or-before its ``ts_col`` within the ``by`` group
    (NULLs when no right row precedes)."""
    left_extra = [c for c in left.columns if c not in by and c != ts_col]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof")
    null_payload = F.lit(None).cast(
        f"struct<{', '.join(f'{c}: {rtypes[c]}' for c in payload_cols)}>"
    ).alias("_asof")

    l_u = left.select(
        *by, ts_col, F.lit(1).alias("_is_left"), *left_extra, null_payload
    )
    r_u = right.select(
        *by,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
        payload,
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_u.unionByName(r_u)
        .withColumn("_m", F.last("_asof", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    return matched.select(
        *by,
        ts_col,
        *left_extra,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )


def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest click at-or-before it:
    the classic point-in-time attribution query."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(purchases, clicks, ["user_id"], "ts", ["click_id", "ts"])
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "asof_click_id",
        F.col("asof_ts").alias("asof_click_ts"),
        (epoch_micros(F.col("ts")) - epoch_micros(F.col("asof_ts"))).alias("gap_us"),
    )


def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution by weekday: for every purchase
    with a same-user click at-or-before it (the as-of attribution match),
    the click→purchase gap in seconds, summarized per purchase weekday —
    the "how long does intent take to convert, and does the weekend
    differ" product question, composing the as-of join with the exact
    percentile aggregate.

    Gap seconds derive from exact integer epoch-micros (one division);
    percentiles use the shared percentile ≡ quantile_cont parity;
    weekday is the engine-neutral epoch arithmetic.  Cost: the as-of
    join's one union-window pass + a 7-row aggregate.

    Output: (dow, n_conversions, p50_s, p90_s, mean_s)."""
    matched = events_asof_purchase_click(spark, sf_dir).filter(
        F.col("asof_click_id").isNotNull()
    )
    gap_s = F.col("gap_us") / F.lit(1_000_000.0)
    dow = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))) % 7
    base = matched.select(dow.alias("dow"), gap_s.alias("gap_s"), "gap_us")
    pct = F.expr("percentile(gap_s, array(0.5, 0.9))")
    return (
        base.groupBy("dow")
        .agg(
            F.count("*").alias("n_conversions"),
            pct[0].alias("p50_s"),
            pct[1].alias("p90_s"),
            # mean from the exact integer micros sum, one division chain
            (
                F.sum("gap_us").cast("long") / F.count("*") / F.lit(1_000_000.0)
            ).alias("mean_s"),
        )
    )
