"""Data-profiling operator — the `dbt test`-adjacent surface generalized:
per-column row/null/distinct counts plus numeric ranges in ONE pass.

The reference's declared checks are per-column ``unique``/``not_null``
assertions (SURVEY.md §2.11; executed by checks.py).  A warehouse team
also wants the *profile* those checks are judged against — ``profile``
computes it for any table as a single aggregate, not one scan per column
(a naive profiler scans N× for N columns; this scans once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.time_utils import epoch_micros
from ..sources.tables import read_table

# (column, kind) — kind drives the numeric-range slot: "num" profiles
# min/max as double, "ts" via exact epoch-micros, "str"/"other" leaves
# them NULL
PROFILE_COLS = (
    ("event_id", "num"),
    ("ts", "ts"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
)

DOCS_PROFILE_COLS = (
    ("doc_id", "num"),
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "num"),
)


def profile(df: DataFrame, cols: tuple[tuple[str, str], ...]) -> DataFrame:
    """One-scan column profile of ``df`` over ``cols`` ((name, kind)).

    All metrics ride a single ``agg``: Catalyst compiles the N
    ``countDistinct`` into one Expand + two-phase hash aggregate, so the
    table is read and shuffled once regardless of column count — at
    100 TB that Expand (N× row multiplication, map-side partial-agg'd)
    is the standard multi-distinct plan and beats N separate scans by
    the width of the table.  Timestamp ranges go through exact integer
    ``epoch_micros`` first, then one double cast (epoch micros ≈ 1.7e15
    < 2^53, so the cast is exact — and identical in both engines).

    Output: one row per column — (column_name, n_rows, n_nulls,
    n_distinct, min_num, max_num); min/max NULL for string columns."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if kind == "num":
            src = F.col(c).cast("double")
        elif kind == "ts":
            src = epoch_micros(F.col(c)).cast("double")
        else:
            src = F.lit(None).cast("double")
        aggs.append(F.min(src).alias(f"min_{c}"))
        aggs.append(F.max(src).alias(f"max_{c}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"min_{c}").alias("min_num"),
            F.col(f"max_{c}").alias("max_num"),
        )
        for c, _ in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of ``events`` (see ``profile``)."""
    return profile(read_table(spark, sf_dir, "events"), PROFILE_COLS)


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of ``documents`` — same generalized
    operator as ``events_profile``, proving the profiler is
    table-agnostic (the ``text`` payload column is deliberately excluded:
    a countDistinct over full document bodies shuffles the corpus by
    text, which a profiler must not do; text-shape metrics live in
    text_analysis.py's scan-speed operators instead)."""
    return profile(read_table(spark, sf_dir, "documents"), DOCS_PROFILE_COLS)


HIST_BINS = 10


def events_value_histogram(
    spark: SparkSession, sf_dir: str, n_bins: int = HIST_BINS
) -> DataFrame:
    """Equi-width histogram of ``value`` per event type — the
    distribution view a profile's min/max can't give (skew, modality,
    tail mass), computed in the classic two-pass shape:

    pass 1: per-type (min, max) — a |types|-row aggregate;
    pass 2: bounds BROADCAST back onto the scan, bucket assignment is a
    stateless projection, and the histogram is one map-side-combined
    aggregate into |types|×n_bins rows.  Two scans, one tiny shuffle —
    the at-scale histogram plan (a single-pass streaming histogram needs
    a sketch; this is the exact form).

    Float parity: bucket width, assignment, and bucket edges use the
    identical IEEE expressions in both engines ((hi−lo)/n_bins, floor,
    lo + bucket·w), so the hash compare is byte-exact.  The top edge
    clamps into the last bucket (least(·, n_bins−1)); a degenerate type
    (hi = lo) collapses to bucket 0.

    Output: (event_type, bucket, bucket_lo, bucket_hi, n_events)."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    j = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "w", (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    )
    bucket = F.when(F.col("w") == 0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / F.col("w")),
            F.lit(n_bins - 1),
        ).cast("long")
    )
    grouped = j.groupBy(
        "event_type", bucket.alias("bucket"), F.col("lo"), F.col("w")
    ).agg(F.count("*").alias("n_events"))
    return grouped.select(
        "event_type",
        "bucket",
        (F.col("lo") + F.col("bucket") * F.col("w")).alias("bucket_lo"),
        (F.col("lo") + (F.col("bucket") + 1) * F.col("w")).alias("bucket_hi"),
        "n_events",
    )


QUANTILE_HIST_PS = (0.5, 0.9, 0.99)


def events_quantile_hist(
    spark: SparkSession,
    sf_dir: str,
    n_bins: int = HIST_BINS,
    ps: tuple[float, ...] = QUANTILE_HIST_PS,
) -> DataFrame:
    """Mergeable histogram quantiles — the QUANTILE member of the sketch
    family (CMS counts, KMV/HLL distincts, Bloom membership all have
    register-exact entries; this adds p50/p90/p99 the same way): the
    equi-width bin counts of ``events_value_histogram`` ARE a mergeable
    sketch (bin vectors add), and a quantile estimate is linear
    interpolation inside the first bin whose cumulative count crosses
    p·n.  Unlike KLL/t-digest, the equi-width sketch is fully
    DETERMINISTIC (no sampling, no merge-order sensitivity), so it is
    hash-checkable against a SQL oracle — the honest trade is a
    value-domain error bound (≤ one bin width) instead of a rank bound.

    Scale shape: the two-pass histogram plan (bounds broadcast back,
    one map-side-combined shuffle into |types|×n_bins rows); the
    cumulative walk and the per-p selection run at that tiny grain
    (partitioned windows, never the fact log).

    Output: (event_type, p, n_total, est), est exact-IEEE-mirrored.
    Pytest pins |est − percentile_disc| ≤ bin width per (type, p): the
    discrete quantile (the crossing-rank order statistic) provably
    shares the estimate's bin; the continuous percentile interpolates
    toward the NEXT order statistic, which can sit across empty bins,
    so the guarantee is stated — and tested — against the disc form."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    j = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "w", (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    )
    bucket = F.when(F.col("w") == 0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / F.col("w")),
            F.lit(n_bins - 1),
        ).cast("long")
    )
    hist = j.groupBy(
        "event_type", bucket.alias("bucket"), F.col("lo"), F.col("w")
    ).agg(F.count("*").alias("n"))
    return quantiles_from_hist(hist, ps)


def quantiles_from_hist(
    hist: DataFrame, ps: tuple[float, ...] = QUANTILE_HIST_PS
) -> DataFrame:
    """The cumulative walk + interpolation over a (event_type, bucket,
    lo, w, n) bin table — shared by the batch sketch above and the
    streaming fold (``streaming/sketch.py::stream_events_quantile_hist``),
    so both produce byte-identical estimates from identical bins.  Runs
    entirely at |types|×n_bins grain (partitioned windows)."""
    run = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("n").over(run)).withColumn(
        "cum_before", F.col("cum") - F.col("n")
    )
    totals = hist.groupBy("event_type").agg(F.sum("n").alias("n_total"))
    probs = cum.join(F.broadcast(totals), "event_type").select(
        "*", F.explode(F.array(*[F.lit(p) for p in ps])).alias("p")
    )
    target = F.col("p") * F.col("n_total")
    hit = probs.filter(F.col("cum") >= target)
    pick = Window.partitionBy("event_type", "p").orderBy("bucket")
    est = F.when(F.col("w") == 0, F.col("lo")).otherwise(
        F.col("lo")
        + F.col("w")
        * (F.col("bucket") + (target - F.col("cum_before")) / F.col("n"))
    )
    return (
        hit.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("event_type", "p", "n_total", est.alias("est"))
    )


def events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of the value column — the
    classic anomaly screen for fabricated or truncated numeric data
    (organic multiplicative quantities follow P(d) = log10(1+1/d);
    uniform or clipped data does not — the DEVIATION is the signal,
    and this synthetic column deviates, which the report shows
    honestly).

    Exact digit extraction: values ride the repo's integer-cents
    discipline (round(v·100) bigint), and the first digit of an
    INTEGER via its string form is deterministic in both engines —
    float-to-string formatting is not, and floor(log10(v)) has the
    exact-power boundary hazard.  Zeros/negatives are excluded and
    counted.  Benford shares are e0 literals; the per-digit excess is
    one subtraction of two single divisions.

    Output: (digit, n_obs, obs_share, benford_share, excess), 9 rows."""
    import math

    ev = read_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    pos = ev.filter(F.col("c") > 0)
    digits = pos.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    benford = spark.createDataFrame(
        [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
        "digit int, benford_share double",
    )
    return (
        benford.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            (F.coalesce("n_obs", F.lit(0)) / F.col("n_total")).alias(
                "obs_share"
            ),
            "benford_share",
            (
                F.coalesce("n_obs", F.lit(0)) / F.col("n_total")
                - F.col("benford_share")
            ).alias("excess"),
        )
    )
