"""Time-series operators over the ``events`` log — rolling windows,
statistical anomaly flagging, and gap interpolation.

The reference has no time-series surface at all (SURVEY.md §2.8/§2.10:
no OVER clauses, no calendar logic beyond ISO-week bucketing), but a
metrics warehouse built on this engine needs exactly these three shapes,
and each has an exact DuckDB oracle:

- ``events_rolling_7d``   per-(type, day) trailing-7-day event count and
                          distinct-user count
- ``events_anomaly``      per-(type, day) z-score of the daily count
                          against that type's full-history distribution
- ``events_interpolate``  linear interpolation of the daily value series
                          over a gap-filled calendar spine

All three aggregate the fact log down to (type, day) grain FIRST — at
100 TB the windows/joins below run over |types|×|days| rows (thousands),
never over the log, so the single fact shuffle into the daily aggregate
is the entire at-scale cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import read_table

ROLLING_DAYS = 7
ANOMALY_Z = 2.0


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n) — the one fact-log shuffle shared by all
    three operators (map-side partial count, then a tiny aggregate)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    return ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling aggregates per (event_type, day): total
    events and distinct active users.

    Two different window mechanics on purpose:

    - the COUNT rolls with a RANGE frame over a dense day index
      (``datediff`` from epoch), so calendar gaps are handled by the
      frame bound, not by row position — a ROWS frame would silently
      widen across missing days;
    - DISTINCT users can't roll as a window (count(distinct) over a
      moving frame isn't decomposable), so each (type, day, user)
      activity row is fanned out to the ≤7 observed days it contributes
      to (``sequence`` + ``explode``) and inner-joined to the observed-day
      spine, then counted distinct per (type, day).  Fan-out is bounded
      by the window length — at 100 TB the cost is 7× the *per-day
      distinct* activity set (entity grain), not 7× the log.

    Output: (event_type, day, n_events, n_events_7d, n_users_7d)."""
    daily = _daily_counts(spark, sf_dir)
    day_idx = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))
    w = (
        Window.partitionBy("event_type")
        .orderBy(day_idx)
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    rolled = daily.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        F.sum("n").over(w).alias("n_events_7d"),
    )
    ev = read_table(spark, sf_dir, "events")
    du = ev.select("event_type", F.to_date("ts").alias("day"), "user_id").distinct()
    contrib = du.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), ROLLING_DAYS - 1))
        ).alias("day"),
    )
    spine = daily.select("event_type", "day")
    users_7d = (
        contrib.join(F.broadcast(spine), ["event_type", "day"])
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )
    # both sides are |types|×|days| aggregates; broadcasting one skips the
    # sort-merge exchange pair a same-size join would otherwise plan
    return rolled.join(F.broadcast(users_7d), ["event_type", "day"])


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags: z-score of each (type, day) count
    against that type's whole-history daily-count distribution.

    Parity discipline: mean and variance are derived from EXACT integer
    sums (n_days, Σn, Σn²) so both engines perform the identical two or
    three IEEE divisions — never ``stddev_pop``, whose Welford-style
    accumulation orders float ops differently per engine/partitioning.
    The stats frame is |types| rows and broadcasts back onto the daily
    aggregate; nothing beyond the shared daily shuffle touches the log.

    Output: (event_type, day, n_events, mean_n, z, is_anomaly); z is NULL
    for a zero-variance type (nullif guard), is_anomaly then false."""
    daily = _daily_counts(spark, sf_dir)
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
    )
    joined = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("sum_n") / F.col("n_days")
    var = F.col("sum_n2") / F.col("n_days") - mean * mean
    z = (F.col("n") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))
    return joined.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        mean.alias("mean_n"),
        z.alias("z"),
        F.coalesce(F.abs(z) > ANOMALY_Z, F.lit(False)).alias("is_anomaly"),
    )


def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the daily mean ``value`` per event_type
    over a gap-filled calendar spine: observed days keep their mean,
    missing days get the straight line between the nearest observed
    neighbours (edge gaps extend the nearest value flat).

    Mechanics: the daily aggregate left-joins onto the per-type day spine
    (``sequence``-exploded from min/max bounds, the events_gap_fill
    shape), then TWO ignore-nulls window passes over one (type, day)
    ordering — ``last(..., ignorenulls)`` looking back and ``first(...,
    ignorenulls)`` looking forward — carry the neighbouring observed
    values and their day indexes to every gap row; the interpolation
    itself is arithmetic on those four columns.  The windows run over the
    |types|×|days| spine, not the log, so at 100 TB this costs the one
    daily-aggregate fact shuffle plus small-frame work, same as gap_fill.

    Output: (event_type, day, observed, value_interp)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(
        (F.sum("value") / F.count("*")).alias("v")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    grid = spine.join(F.broadcast(daily), ["event_type", "day"], "left")
    idx = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))
    grid = grid.withColumn("idx", idx)
    obs_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("idx")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    g = (
        grid.withColumn("pv", F.last("v", ignorenulls=True).over(w_back))
        .withColumn("pi", F.last(obs_idx, ignorenulls=True).over(w_back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_fwd))
        .withColumn("ni", F.first(obs_idx, ignorenulls=True).over(w_fwd))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("idx") - F.col("pi"))
            / (F.col("ni") - F.col("pi")),
        )
        .otherwise(F.coalesce(F.col("pv"), F.col("nv")))
    )
    return g.select(
        "event_type",
        "day",
        F.col("v").isNotNull().alias("observed"),
        interp.alias("value_interp"),
    )


MOVING_N = 5


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average over the last ``MOVING_N`` events — the
    ROWS-frame window class (events_rolling_7d covers RANGE frames; this
    is the count-based sibling streams of irregular ticks need, where a
    time frame would hold wildly varying row counts).

    One shuffle on user_id; the frame sum is evaluated over the same
    per-key sort as the ordering (ts, event_id — a total order, so the
    frame contents and their fold order are identical in both engines;
    the mean is that exact fold divided by the frame row count).

    Output: (event_id, user_id, ts, value, n_window, moving_avg)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MOVING_N - 1), 0)
    )
    n_win = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        n_win.cast("long").alias("n_window"),
        (F.sum("value").over(w) / n_win).alias("moving_avg"),
    )


def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the daily-count series between
    event types — the co-movement matrix behind metric clustering and
    anomaly root-causing ("errors spike with signups?").

    Parity discipline (the same rule as events_anomaly): the correlation
    is assembled from EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy²) over
    the zero-filled day×type spine, so both engines perform the identical
    handful of IEEE ops — never ``corr()``, whose streaming accumulation
    is order-dependent.  Zero-filling matters: a type absent on a day is
    a 0 observation, not a missing row, or the pair's day sets diverge.

    Plan: one log shuffle into the (type, day) aggregate; the spine fill,
    the |types|²/2 pair join, and the sum aggregate all run at
    |types|×|days| grain (thousands of rows at any corpus size).

    Output: (type_a, type_b, n_days, corr), one row per unordered pair
    a < b."""
    daily = _daily_counts(spark, sf_dir)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    a = dense.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("x")
    )
    b = dense.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("y")
    )
    sums = (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    n = F.col("n_days")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        "type_a",
        "type_b",
        "n_days",
        (cov / F.nullif(F.sqrt(var_x) * F.sqrt(var_y), F.lit(0.0))).alias("corr"),
    )


DOW_LABELS = ("mon", "tue", "wed", "thu", "fri", "sat", "sun")


def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence diagnostic between event type and day of
    week: per type, the χ² contribution of that type's weekday profile
    against the all-types profile — the "is this metric's weekly shape
    different from everything else's" test behind seasonality alerts.

    Engine-neutral weekday: ``datediff(day, epoch-Monday) % 7`` — both
    engines' native dayofweek() disagree on numbering (Spark 1=Sun,
    DuckDB 0=Sun), epoch arithmetic doesn't.  Parity discipline: weekday
    counts land in FIXED columns (the events_user_entropy trick), the
    expected counts and χ² terms evaluate in tuple order, so the float
    path is the identical IEEE sequence in both engines; a weekday with
    zero global mass contributes 0 (guard, not NaN).

    Plan: one shuffle into the |types|-row contingency aggregate; the
    1-row global profile cross-broadcasts back; everything after is a
    projection over ≤ |types| rows.

    Output: (event_type, n_row, chi2_component, dof) with dof = 6."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-05"))) % 7
        ).alias("dow"),
    )
    row_aggs = [
        F.sum((F.col("dow") == d).cast("long")).alias(f"n_{lbl}")
        for d, lbl in enumerate(DOW_LABELS)
    ]
    per_type = ev.groupBy("event_type").agg(*row_aggs)
    tot_aggs = [
        F.sum((F.col("dow") == d).cast("long")).alias(f"t_{lbl}")
        for d, lbl in enumerate(DOW_LABELS)
    ] + [F.count("*").alias("n_total")]
    totals = ev.agg(*tot_aggs)
    j = per_type.join(F.broadcast(totals))
    row_total = None
    for lbl in DOW_LABELS:
        c = F.col(f"n_{lbl}")
        row_total = c if row_total is None else row_total + c
    chi2 = None
    for lbl in DOW_LABELS:
        n = F.col(f"n_{lbl}")
        t = F.col(f"t_{lbl}")
        e = row_total * t / F.col("n_total")
        term = F.when(t > 0, (n - e) * (n - e) / e).otherwise(F.lit(0.0))
        chi2 = term if chi2 is None else chi2 + term
    return j.select(
        "event_type",
        row_total.alias("n_row"),
        chi2.alias("chi2_component"),
        F.lit(len(DOW_LABELS) - 1).cast("long").alias("dof"),
    )


MAD_CONSISTENCY = 1.4826  # normal-consistency constant for MAD→σ
MAD_Z = 3.0


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier flags via MEDIAN/MAD — the heavy-tail-safe
    sibling of ``events_anomaly``'s mean/σ z-score (one extreme value
    drags a mean arbitrarily; the median absolute deviation shrugs it
    off — the standard robust-statistics gate for metric streams).

    Two exact order-statistic passes, both the one-shuffle-one-sort
    shape of ``events_median`` (deterministic lower-median rule,
    event_id tie-break): pass 1 the per-type median of ``value``, pass 2
    the per-type median of |value − median|.  Both per-type frames are
    |types| rows and broadcast back onto the scan.  robust_z divides in
    the identical IEEE order as the oracle; a zero-MAD type yields NULL
    z (nullif guard) and false flags.

    Output: (event_id, event_type, value, med, mad, robust_z,
    is_outlier) at log grain."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
    n1 = Window.partitionBy("event_type")
    med = (
        ev.withColumn("rn", F.row_number().over(w1))
        .withColumn("n", F.count("*").over(n1))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    w2 = Window.partitionBy("event_type").orderBy("adev", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count("*").over(n1))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("adev").alias("mad"))
    )
    z = (F.col("value") - F.col("med")) / F.nullif(
        F.lit(MAD_CONSISTENCY) * F.col("mad"), F.lit(0.0)
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        z.alias("robust_z"),
        F.coalesce(F.abs(z) > MAD_Z, F.lit(False)).alias("is_outlier"),
    )


def dim_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generated from the fact log's own date bounds —
    the date-spine dimension every warehouse joins to (the dbt
    ``date_spine`` utility as a first-class operator): one row per day
    from min to max event date with the standard attribute set.

    Engine-parity choices: ``iso_week`` uses each engine's ISO
    weekofyear (their agreement is load-bearing for the reference's Q8
    and proven by that green row); ``dow`` is epoch-Monday arithmetic
    (native dayofweek numbering disagrees across engines); ``iso_year``
    is the year the ISO week belongs to (Dec 29+ can belong to week 1
    of the NEXT year, Jan 1-3 to week 52/53 of the PREVIOUS — the
    year(ts) pairing bug events_retention's dense week index avoids is
    handled here explicitly).

    Plan: the spine explodes from a 1-row (min, max) aggregate —
    |days| rows of pure projection; the fact log is touched once for
    its bounds.  Output: (day, year, iso_year, quarter, month,
    day_of_month, iso_week, dow, is_weekend)."""
    ev = read_table(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    dow = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-05"))) % 7
    iso_week = F.weekofyear("day")
    # ISO year: the calendar year of the Thursday in this day's ISO week
    # (engine-neutral arithmetic: Thursday = day - dow + 3)
    iso_year = F.year(F.date_add(F.col("day"), 3 - dow))
    return spine.select(
        "day",
        F.year("day").cast("long").alias("year"),
        iso_year.cast("long").alias("iso_year"),
        F.quarter("day").cast("long").alias("quarter"),
        F.month("day").cast("long").alias("month"),
        F.dayofmonth("day").cast("long").alias("day_of_month"),
        iso_week.cast("long").alias("iso_week"),
        dow.cast("long").alias("dow"),
        (dow >= 5).alias("is_weekend"),
    )


MAU_DAYS = 28


def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + stickiness per day — the engagement headline
    metrics: distinct users active that day, in the trailing 7 days, and
    in the trailing 28 days, plus DAU/MAU.

    One expansion serves all three windows: the distinct (user, day)
    activity set (entity grain — the single fact shuffle) explodes each
    activity day to the ≤28 target days it can contribute to, and each
    window is a CONDITIONAL distinct over the same exploded frame
    (offset 0 / <7 / <28) — one shuffle, one aggregate, three windows,
    instead of three separate self-joins.  Clipped at the corpus max day
    (trailing windows past it are unobserved).

    Output: (day, dau, wau, mau, stickiness)."""
    ud = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    mx = ud.agg(F.max("day").alias("max_day"))
    ex = ud.select(
        "user_id",
        F.col("day").alias("src_day"),
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", MAU_DAYS - 1))
        ).alias("day"),
    ).withColumn("offset", F.datediff("day", "src_day"))
    agg = (
        ex.join(F.broadcast(mx))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day")
        .agg(
            F.count_distinct(F.when(F.col("offset") == 0, F.col("user_id"))).alias("dau"),
            F.count_distinct(F.when(F.col("offset") < 7, F.col("user_id"))).alias("wau"),
            F.count_distinct(F.col("user_id")).alias("mau"),
        )
    )
    return agg.select(
        "day", "dau", "wau", "mau", (F.col("dau") / F.col("mau")).alias("stickiness")
    )


PARETO_SHARE = 0.8


def events_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve: users ordered by activity desc, with
    each user's cumulative share of all events and a flag for the head
    segment that generates the first ``PARETO_SHARE`` of volume — the
    "does 20% of the base drive 80% of the load" answer, which is also
    the key-skew exposure in entity terms.

    Entity-grain aggregate first (one fact shuffle); the global rank and
    cumulative sum then come from the TWO-LEVEL prefix primitive
    (``functions/ranking.py``: range partition on (n_events desc,
    user_id) + partitioned local running sums + broadcast per-partition
    offsets) — no partition-less WindowExec, so the per-user frame never
    serializes through one task at extreme user counts.  The grand total
    falls out of the same bounded offsets collect (no separate
    broadcast-total join or second pass).

    Output: (user_id, n_events, user_rank, cum_share, in_head)."""
    from ..functions.ranking import two_level_prefix

    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    ranked, totals = two_level_prefix(
        per_user,
        [F.desc("n_events"), F.asc("user_id")],
        measures={"cum": F.col("n_events")},
        rank_col="user_rank",
    )
    n_total = totals["cum"]
    return ranked.select(
        "user_id",
        "n_events",
        F.col("user_rank").cast("long").alias("user_rank"),
        (F.col("cum") / F.lit(n_total)).alias("cum_share"),
        (F.col("cum") - F.col("n_events") < F.lit(n_total) * PARETO_SHARE).alias(
            "in_head"
        ),
    )


EWMA_LOOKBACK_DAYS = 28   # weights below 2^-28 truncate (mirrored in SQL)


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily event count
    per type, with a DYADIC decay (α = 1/2 per day) chosen so the
    smoothing is bit-deterministic across engines: every weight
    2^-(day gap) is an exact IEEE double, every term n·2⁻ᵈ is an exact
    dyadic rational, and the normalized estimate is one division of
    exact operands — no libm `exp`/`pow` rounding disagreement can
    creep in (integer powers of 0.5 are exact in any pow
    implementation).

    Decay is CALENDAR-aware: the exponent is the day GAP, not the row
    position, so history loses weight by elapsed days — the same gap
    discipline as the RANGE-frame in ``events_rolling_7d`` (a
    row-position recurrence would decay gaps wrong).  Note the estimator
    is OBSERVED-DAYS-NORMALIZED: both the numerator and the weight sum
    run over observed days only, so a missing day shrinks numerator AND
    denominator (a weighted mean of observed values) — this is NOT the
    zero-fill model, where a missing day would contribute weight but no
    value and pull the estimate toward zero.  Zero-fill needs the
    ``dim_calendar`` spine joined in first; this operator deliberately
    reports the observed-days mean (the "average when active" reading).
    The lookback truncates at ``EWMA_LOOKBACK_DAYS`` (weights < 2⁻²⁸),
    identically in the oracle.

    Scale shape: the fact log collapses to the (type, day) grain FIRST
    (the shared `_daily_counts` shuffle); the windowed self-join then
    fans each anchor day out to ≤ 28 observed predecessors — bounded by
    the lookback × |days| per type, never by the log.

    Output: (event_type, day, n_events, ewma)."""
    daily = _daily_counts(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    gap = F.datediff(F.col("a.day"), F.col("b.day"))
    j = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (gap >= 0)
        & (gap < EWMA_LOOKBACK_DAYS),
    )
    w = F.pow(F.lit(0.5), gap.cast("double"))
    return (
        j.groupBy(
            F.col("a.event_type").alias("event_type"), F.col("a.day").alias("day")
        )
        .agg(
            F.max(F.when(gap == 0, F.col("b.n"))).alias("n_events"),
            (F.sum(F.col("b.n") * w) / F.sum(w)).alias("ewma"),
        )
    )


def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile per event type: how each ISO weekday's
    average daily volume compares to the type's overall traffic — the
    seasonal-naive decomposition a capacity planner reads before any
    fancier model.

    Weekday numbering is pinned to ISO (1 = Monday … 7 = Sunday) on
    both engines — Spark's ``dayofweek`` is 1 = Sunday while DuckDB's
    ``dayofweek`` is 0 = Sunday, a classic cross-engine off-by-one, so
    the operator uses ``weekday()+1`` and the oracle ``isodow()``.

    Exactness: day counts and event totals are integers; ``avg_daily``
    and ``share`` are single divisions (the share's denominator is the
    partition-window total — kept integer, cast inside the window to
    dodge DuckDB's HUGEINT promotion).

    Scale shape: the fact log collapses to (type, day) first (shared
    `_daily_counts` shuffle); everything after is ≤ 7 rows per type.
    Output: (event_type, iso_weekday, n_days, total_events, avg_daily,
    share)."""
    daily = _daily_counts(spark, sf_dir)
    by_dow = daily.groupBy(
        "event_type",
        (F.expr("weekday(day)") + F.lit(1)).alias("iso_weekday"),
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("total_events"),
        (F.sum("n") / F.count("*")).alias("avg_daily"),
    )
    w = Window.partitionBy("event_type")
    return by_dow.select(
        "event_type",
        "iso_weekday",
        "n_days",
        "total_events",
        "avg_daily",
        (F.col("total_events") / F.sum("total_events").over(w)).alias("share"),
    )


DRIFT_SMOOTH = 1                # Laplace +1 per (week, type) cell


def events_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-baseline drift of the event-type mix — the temporal
    PSI monitor (``corpus_split_drift``'s time-axis twin): each week's
    event-type distribution scored against the FIRST week's, the
    metric a pipeline alerts on when upstream product changes shift
    the event mix under a trained model.

    The bands are the event types themselves — categorical, so there
    is no bucket-boundary math at all; counts are Laplace-smoothed on
    the full week×type grid, shares are single divisions, and the
    |types|-term ln sum sits far inside the 6-dp rounding.

    Scale shape: one (week, type) aggregate — tens of rows — then
    broadcast joins of the baseline row; the fact is scanned once.
    Output: (week, n_events, psi_vs_first)."""
    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        "event_type",
    )
    cell = ev.groupBy("week", "event_type").agg(F.count("*").alias("n"))
    weeks = cell.select("week").distinct()
    types = cell.select("event_type").distinct()
    grid = weeks.crossJoin(F.broadcast(types))
    sm = grid.join(cell, ["week", "event_type"], "left").select(
        "week",
        "event_type",
        (F.coalesce("n", F.lit(0)) + F.lit(DRIFT_SMOOTH)).alias("n_sm"),
        F.coalesce("n", F.lit(0)).alias("n_raw"),
    )
    tot = sm.groupBy("week").agg(
        F.sum("n_sm").alias("tot_sm"), F.sum("n_raw").alias("n_events")
    )
    shares = sm.join(tot, "week").select(
        "week",
        "event_type",
        "n_events",
        (F.col("n_sm") / F.col("tot_sm")).alias("share"),
    )
    first = shares.join(
        F.broadcast(weeks.agg(F.min("week").alias("week"))), "week"
    ).select("event_type", F.col("share").alias("p"))
    psi_term = (F.col("share") - F.col("p")) * F.log(F.col("share") / F.col("p"))
    return (
        shares.join(F.broadcast(first), "event_type")
        .groupBy("week")
        .agg(
            F.max("n_events").alias("n_events"),
            F.sum(psi_term).alias("psi_vs_first"),
        )
    )


HOLT_ALPHA = 0.5                # dyadic level weight (exact in binary)
HOLT_BETA = 0.25                # dyadic trend weight


def events_holt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of the daily event series —
    EWMA's trend-aware sibling (level + trend state, 1-step-ahead
    forecast), the workhorse short-horizon forecaster.

    The recursion l' = α·x + (1−α)(l+t); t' = β(l'−l) + (1−β)t is a
    SEQUENTIAL left fold — not window-expressible — so it runs as a
    higher-order ``aggregate`` over each type's zero-filled ordered
    daily array (30 values here).  With DYADIC α=1/2, β=1/4 every
    multiply is an exact binary scaling and every sum a dyadic
    rational: the fold is bit-identical cross-engine, like the EWMA's
    dyadic weights (DuckDB's ``list_reduce`` seeds the accumulator
    with the first element, so the Spark fold initializes level to
    x₀, trend to 0 and folds the remainder — the same trajectory).

    Scale shape: the fact collapses to (type, day) counts first; the
    per-type fold touches |days| values.  A 100 TB deployment folds
    per (entity, window) key in parallel — same plan, wider key.
    Output: (event_type, n_days, level, trend, forecast_next)."""
    daily0 = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    bounds = daily0.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = daily0.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    daily = grid.join(daily0, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("sd")
    )
    arr = F.transform(F.col("sd"), lambda s: s["n"].cast("double"))
    a, b1 = HOLT_ALPHA, 1.0 - HOLT_ALPHA
    bt, bt1 = HOLT_BETA, 1.0 - HOLT_BETA

    def step(acc, x):
        lvl = F.lit(a) * x + F.lit(b1) * (acc[0] + acc[1])
        lvl2 = F.lit(a) * x + F.lit(b1) * (acc[0] + acc[1])
        trend = F.lit(bt) * (lvl2 - acc[0]) + F.lit(bt1) * acc[1]
        return F.array(lvl, trend)

    folded = series.select(
        "event_type",
        F.size(arr).alias("n_days"),
        F.aggregate(
            F.slice(arr, 2, F.size(arr) - 1),
            F.array(F.element_at(arr, 1), F.lit(0.0)),
            step,
        ).alias("lt"),
    )
    return folded.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("lt")[0].alias("level"),
        F.col("lt")[1].alias("trend"),
        (F.col("lt")[0] + F.col("lt")[1]).alias("forecast_next"),
    )


def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the median of all
    pairwise daily slopes, the estimator that shrugs off the outlier
    days that wreck OLS (``events_user_trend``'s least-squares is the
    fragile sibling; MAD outliers are the detection side, this is the
    robust fit).

    Exactness: every slope is the RATIONAL (n_j−n_i)/(j−i) with small
    integer parts; the min gap between distinct such rationals is
    ≫ double ulp at these magnitudes, so ordering by the double
    quotient is provably exact ordering of the rationals, and the
    LOWER median under the total order (slope, num, den, i, j) is
    engine-deterministic.  The median is reported as the exact
    (num, den) pair plus the quotient.

    Scale shape: the fact collapses to (type, day) first; the pairwise
    self-join is |days|²/2 per type (435 pairs over 30 days) — at
    production horizon ``events_theil_sen_sampled`` bounds this with
    deterministic hash-mod pair subsampling; here the full estimator
    fits easily.
    Output: (event_type, n_pairs, med_num, med_den, theil_slope)."""
    return _theil_sen(spark, sf_dir, sample_mod=None)


# pair-subsample modulus for the production-horizon variant: keeps
# ~1/mod of the |days|²/2 slope pairs, selected by the portable pair
# hash (deterministic, oracle-reproducible — the hash-mod discipline of
# corpus_split / events_sample, applied at PAIR grain)
THEIL_SAMPLE_MOD = 3


def events_theil_sen_sampled(
    spark: SparkSession, sf_dir: str, sample_mod: int = THEIL_SAMPLE_MOD
) -> DataFrame:
    """Subsampled Theil–Sen — the production-horizon form the exact
    estimator's docstring promises: the |days|²/2 pair blow-up is
    bounded by keeping only pairs with
    ``portable_hash60(type|i|j) % sample_mod == 0`` (expected |pairs|/
    mod, deterministic and engine-reproducible, so the oracle computes
    the IDENTICAL subsample — no RNG seed drift).  The median over a
    uniform pair subsample is the classic consistent estimator
    (Matoušek's randomized Theil–Sen); at ``sample_mod=1`` this is
    bit-identical to ``events_theil_sen`` (pytest-pinned).

    Output: (event_type, n_pairs, med_num, med_den, theil_slope) where
    n_pairs counts the SAMPLED pairs the median ranks over."""
    return _theil_sen(spark, sf_dir, sample_mod=sample_mod)


def _theil_sen(
    spark: SparkSession, sf_dir: str, sample_mod: int | None
) -> DataFrame:
    from ..functions.hashing import portable_hash60

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias(
                "i"
            ),
            "n",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (F.col("b.n") - F.col("a.n")).alias("num"),
            (F.col("b.i") - F.col("a.i")).alias("den"),
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
        )
        .withColumn("slope", F.col("num") / F.col("den"))
    )
    if sample_mod is not None:  # mod 1 keeps every pair (the pinned twin)
        pair_key = F.concat_ws(
            "|",
            F.col("event_type"),
            F.col("i").cast("string"),
            F.col("j").cast("string"),
        )
        pairs = pairs.filter(portable_hash60(pair_key) % sample_mod == 0)
    w = Window.partitionBy("event_type").orderBy(
        F.asc("slope"), F.asc("num"), F.asc("den"), F.asc("i"), F.asc("j")
    )
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    counts = pairs.groupBy("event_type").agg(F.count("*").alias("n_pairs"))
    return (
        ranked.join(counts, "event_type")
        .filter(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
        .select(
            "event_type",
            "n_pairs",
            F.col("num").alias("med_num"),
            F.col("den").alias("med_den"),
            F.col("slope").alias("theil_slope"),
        )
    )


def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival of time-to-REPEAT-purchase with RIGHT
    CENSORING — real survival analysis (``corpus_survival`` is a
    pipeline funnel; this is the estimator): users who never repurchase
    inside the observation window are censored at window end, not
    dropped (dropping them is the classic churn-analysis bias).

    Duration = days from first to second purchase; censor time = days
    from first purchase to the global window end.  All risk-set and
    event counts are integers (ties resolve events-before-censors, the
    standard convention); S(t) = Π(1 − d/n) is evaluated as
    exp(Σ ln(·)) over ≤|window| ordered event times — the ~ulp-scale
    libm drift sits far inside the 6-dp hash rounding (ln/cos/sqrt
    precedent).  Output rows at event times only (the KM steps).

    Scale shape: one user-grain pass builds (duration, is_event); the
    time-grain table is ≤ window-days rows; windows run on it, never
    the fact.  Output: (t_days, n_risk, n_events, n_censored,
    km_survival)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
    )
    window_end = ev.agg(F.max("day").alias("end_day"))
    purch = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("day")
    firsts = (
        purch.select("user_id", "day")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.min("day").alias("t1"),
            F.max(F.when(F.col("rn") == 2, F.col("day"))).alias("t2"),
        )
    )
    obs = firsts.crossJoin(F.broadcast(window_end)).select(
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("end_day", "t1")).alias("t"),
        F.col("t2").isNotNull().alias("is_event"),
    )
    times = obs.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(~F.col("is_event"), 1).otherwise(0)).alias("c"),
    )
    total = obs.count()  # bounded scalar: |users with a purchase|
    w_t = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = times.withColumn(
        "n_risk",
        F.lit(int(total))
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_t), F.lit(0)),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # a time where every remaining subject events (d = n_risk) drives
    # survival to EXACT zero — handled as a flag, not ln(0)
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    log_sum = F.sum(
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")),
        ).otherwise(F.lit(0.0))
    ).over(w_cum)
    km = at_risk.withColumn(
        "km_survival",
        F.when(hit_zero == 1, F.lit(0.0)).otherwise(F.exp(log_sum)),
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        "km_survival",
    )


def events_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two hash-split arms' repeat-purchase
    survival curves — the capstone of the experiment-test family (z on
    rates, U on ranks, KS on distributions, log-rank on CENSORED
    time-to-event: the only one of the four that compares churn
    honestly).

    At every joint event time: O₁ += d₁, E₁ += d·n₁/n, and the
    hypergeometric variance V += d·(n₁/n)·(n₂/n)·(n−d)/(n−1); the
    statistic is (O₁−E₁)/√V.  Every count is an exact integer from
    the same right-censored observation table as ``events_kaplan_meier``
    (events-before-censors ties); the divisions are fixed-order and the
    sqrt IEEE-exact, so the oracle carries no tolerance beyond the
    final decimals.  A/A calibration (|z| < 3) pinned in pytest.

    Scale shape: user-grain observations → joint time-grain table
    (≤ window-days rows) → 1-row fold.
    Output: (n_a, n_b, o_a, e_a, v, z_score)."""
    from ..functions.hashing import portable_hash60
    from ..operators.analytics import AB_SPLIT_MOD

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    window_end = ev.agg(F.max("day").alias("end_day"))
    purch = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("day")
    firsts = (
        purch.select("user_id", "day")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.min("day").alias("t1"),
            F.max(F.when(F.col("rn") == 2, F.col("day"))).alias("t2"),
        )
    )
    obs = firsts.crossJoin(F.broadcast(window_end)).select(
        (portable_hash60(F.col("user_id")) % AB_SPLIT_MOD == 0).alias("arm_a"),
        F.when(
            F.col("t2").isNotNull(), F.datediff("t2", "t1")
        ).otherwise(F.datediff("end_day", "t1")).alias("t"),
        F.col("t2").isNotNull().alias("is_event"),
    )
    times = obs.groupBy("t").agg(
        F.sum(F.when(F.col("arm_a") & F.col("is_event"), 1).otherwise(0)).alias(
            "d1"
        ),
        F.sum(
            F.when(~F.col("arm_a") & F.col("is_event"), 1).otherwise(0)
        ).alias("d2"),
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).alias("r1"),
        F.sum(F.when(~F.col("arm_a"), 1).otherwise(0)).alias("r2"),
    )
    tot = obs.agg(
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("arm_a"), 1).otherwise(0)).alias("n_b"),
    )
    w_t = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = times.crossJoin(F.broadcast(tot)).select(
        "*",
        (F.col("n_a") - F.coalesce(F.sum("r1").over(w_t), F.lit(0))).alias(
            "n1"
        ),
        (F.col("n_b") - F.coalesce(F.sum("r2").over(w_t), F.lit(0))).alias(
            "n2"
        ),
    )
    d = F.col("d1") + F.col("d2")
    n = F.col("n1") + F.col("n2")
    e1 = d * F.col("n1") / n
    v = F.when(
        n > 1,
        d
        * (F.col("n1") / n)
        * (F.col("n2") / n)
        * (n - d)
        / (n - 1),
    ).otherwise(F.lit(0.0))
    agg = risk.filter(d > 0).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum("d1").alias("o_a"),
        F.sum(e1).alias("e_a"),
        F.sum(v).alias("v"),
    )
    z = F.when(
        F.col("v") > 0,
        (F.col("o_a") - F.col("e_a")) / F.sqrt(F.col("v")),
    ).otherwise(F.lit(0.0))
    return agg.select("n_a", "n_b", "o_a", "e_a", "v", z.alias("z_score"))


ACF_MAX_LAG = 7


def events_autocorrelation(
    spark: SparkSession, sf_dir: str, max_lag: int = ACF_MAX_LAG
) -> DataFrame:
    """Lag-k autocorrelation (ACF) of each event type's daily-count
    series, k = 1..``max_lag`` — the diagnostic behind seasonality
    detection (weekly traffic shows a lag-7 spike) and forecast-model
    order selection.

    Exactness discipline (same as events_type_correlation): never a
    float mean in the hot math.  With D = n_days, S = Σx, the centered
    products scale through by D²::

        num_k = Σ_{t≤D-k} (D·x_t − S)(D·x_{t+k} − S)   (exact bigint)
        den   = Σ_t      (D·x_t − S)²                  (exact bigint)
        r_k   = num_k / den                            (one IEEE divide)

    so both engines compute identical integers and one division.  The
    series is the ZERO-FILLED dense day spine per type (a missing day is
    a 0 observation — without filling, lags skip calendar days and the
    "lag" loses meaning).

    Plan: one fact shuffle to (type, day) grain; spine fill, lead()
    windows (partitioned by type) and the lag aggregate all run at
    |types|×|days|×|lags| grain — thousands of rows at any corpus size.

    Output: (event_type, lag, n_terms, acf), acf NULL for a constant
    series (den = 0)."""
    daily = _daily_counts(spark, sf_dir)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("x"))
    )
    tot = dense.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("x").alias("s")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    leads = dense.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        (F.col("d") * F.col("x") - F.col("s")).alias("c0"),
        *[
            (F.col("d") * F.lead("x", k).over(w) - F.col("s")).alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    den_tbl = leads.groupBy("event_type").agg(
        F.sum(F.col("c0") * F.col("c0")).alias("den")
    )
    lagged = leads.join(F.broadcast(den_tbl), "event_type").select(
        "event_type",
        "den",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        (F.col("c0") * F.col(f"c{k}")).alias("prod"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("kp"),
    )
    return (
        lagged.groupBy("event_type", F.col("kp.lag").alias("lag"))
        .agg(
            F.count(F.col("kp.prod")).alias("n_terms"),
            F.sum(F.col("kp.prod")).alias("num"),
            F.first("den").alias("den"),
        )
        .select(
            "event_type",
            "lag",
            "n_terms",
            F.when(F.col("den") > 0, F.col("num") / F.col("den")).alias("acf"),
        )
    )


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the day where the
    cumulative deviation of the daily-count series from its overall
    mean peaks in magnitude — the classic single-change-point estimator
    (a level shift at day τ makes |S_i| a tent function peaking at τ).

    Integer-exact CUSUM: with D days, total T and cumulative C_i, the
    mean-centered partial sum scales through by D::

        S_i = D·C_i − i·T          (exact bigint; S_D = 0 identically)

    The change point is argmax |S_i| (ties → earliest day), found with
    a max-of-struct aggregate, not a sort.  The magnitude is reported
    normalized (|S|/D² = the classic max|Σ(x−x̄)|/D in exact form ÷ D)
    as one terminal IEEE division.

    Plan: fact shuffle to (type, day); the cumulative window is
    partitioned by type; everything after runs at |types|×|days| grain.
    Zero-filled spine for the same calendar-integrity reason as the ACF.

    Output: (event_type, n_days, change_day, cusum_stat) — one row per
    type."""
    daily = _daily_counts(spark, sf_dir)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = dense.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("x").alias("t")
    )
    s = dense.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "d",
        (
            F.col("d") * F.sum("x").over(run)
            - F.row_number().over(w) * F.col("t")
        ).alias("s_i"),
    )
    # argmax |S_i| with earliest-day tie-break via one max-of-struct:
    # day encodes as a negated epoch-day so bigger struct = earlier day
    day_num = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))
    picked = s.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs(F.col("s_i")).alias("mag"),
                (-day_num).cast("long").alias("neg_day"),
            )
        ).alias("m"),
        F.first("d").alias("n_days"),
    )
    return picked.select(
        "event_type",
        "n_days",
        F.date_add(
            F.to_date(F.lit("1970-01-01")), (-F.col("m.neg_day")).cast("int")
        ).alias("change_day"),
        (
            F.col("m.mag")
            / (F.col("n_days").cast("double") * F.col("n_days").cast("double"))
        ).alias("cusum_stat"),
    )


def events_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SPEARMAN rank correlation of the daily-count series
    between event types — the robust sibling of
    ``events_type_correlation``: invariant to monotone transforms and
    insensitive to heavy-tailed spikes, so the pair (Pearson, Spearman)
    separates "linear co-movement" from "any monotone co-movement".

    Exactness: Spearman = Pearson over MIDRANKS, and midranks of an
    integer series are exact half-integers (the events_mann_whitney
    argument), so the op carries DOUBLED midranks as exact bigints::

        2·midrank = rank_first + rank_last
                  = 2·rank() + (tie_count − 1)

    The constant factor cancels inside the correlation, leaving the
    identical integer-moment assembly as the Pearson op (n, Σr, Σr',
    Σrr', Σr², Σr'²) and two terminal sqrt/divide IEEE ops.

    Plan: identical shape to events_type_correlation — one fact
    shuffle, then |types|×|days| spine, per-type rank windows
    (partitioned), |types|²/2 pair join.

    Output: (type_a, type_b, n_days, rho), one row per unordered pair
    a < b."""
    daily = _daily_counts(spark, sf_dir)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("x"))
    )
    wv = Window.partitionBy("event_type").orderBy("x")
    ranked = dense.select(
        "event_type",
        "day",
        (
            F.lit(2) * F.rank().over(wv)
            + F.count("*").over(
                Window.partitionBy("event_type", "x")
            )
            - F.lit(1)
        ).cast("long").alias("r2"),
    )
    a = ranked.select(
        F.col("event_type").alias("type_a"), "day", F.col("r2").alias("ra")
    )
    b = ranked.select(
        F.col("event_type").alias("type_b"), "day", F.col("r2").alias("rb")
    )
    sums = (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("ra").alias("sx"),
            F.sum("rb").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).alias("syy"),
        )
    )
    n = F.col("n_days")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        "type_a",
        "type_b",
        "n_days",
        (cov / F.nullif(F.sqrt(var_x) * F.sqrt(var_y), F.lit(0.0))).alias("rho"),
    )


SEASONAL_HALF_WINDOW = 3   # centered 7-day trend window (±3 days)


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition of each event type's
    daily series: value = trend + seasonal + residual — the STL-lite
    report an anomaly triager reads to separate "weekends are always
    slow" from "something actually moved" (weekday_profile gives the
    seasonal SHAPE; this one also removes the trend and hands back the
    residual the alert should fire on).

    Semantics (all grain-bounded, all mirrored exactly by the oracle):

    - ``trend``: centered 7-day mean — sum/count over days PRESENT in
      [d−3, d+3] via a RANGE frame on the day index, so calendar gaps
      SHRINK the window instead of dragging in stale rows (the
      rolling_7d discipline), and series edges use the observed half
      window rather than inventing data;
    - ``seasonal``: per (type, ISO weekday) mean of the detrended value
      n − trend (Spark ``weekday()+1`` ↔ DuckDB ``isodow`` — the pinned
      cross-engine numbering);
    - ``residual``: n − trend − seasonal, evaluated left-to-right in
      both engines.

    Determinism: daily counts are integers; trend is one division of
    exact integers (bit-exact).  ``seasonal`` is the one order-sensitive
    float mean (~52 doubles per weekday cell, error ~1e−13 — far below
    the 6-dp hash rounding, the substitutes/pagerank-approved envelope).

    Scale shape: the fact log collapses to (type, day) in the shared
    `_daily_counts` shuffle; both windows partition by event_type (and
    weekday) at the ≤366-rows-per-type daily grain — no partition-less
    window, nothing further at log scale.

    Output: (event_type, day, n_events, trend, seasonal, residual)."""
    daily = _daily_counts(spark, sf_dir)
    day_idx = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))
    wt = (
        Window.partitionBy("event_type")
        .orderBy(day_idx)
        .rangeBetween(-SEASONAL_HALF_WINDOW, SEASONAL_HALF_WINDOW)
    )
    detrended = daily.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        (F.sum("n").over(wt) / F.count("n").over(wt)).alias("trend"),
    )
    ws = Window.partitionBy(
        "event_type", (F.expr("weekday(day)") + F.lit(1))
    )
    out = detrended.withColumn(
        "seasonal",
        F.avg(F.col("n_events") - F.col("trend")).over(ws),
    )
    return out.select(
        "event_type",
        "day",
        "n_events",
        "trend",
        "seasonal",
        (F.col("n_events") - F.col("trend") - F.col("seasonal")).alias("residual"),
    )


XCORR_MAX_LAG = 3
XCORR_MIN_DAYS = 3  # a 2-point overlap is always |r| = 1 — degenerate
XCORR_X_TYPE = "click"
XCORR_Y_TYPE = "purchase"


def events_lagged_crosscorr(
    spark: SparkSession,
    sf_dir: str,
    max_lag: int = XCORR_MAX_LAG,
    x_type: str = XCORR_X_TYPE,
    y_type: str = XCORR_Y_TYPE,
) -> DataFrame:
    """LAGGED CROSS-CORRELATION between two event-type daily series —
    the lead/lag diagnostic ``events_type_correlation`` (contemporaneous,
    per-user) cannot answer: does click volume on day t predict purchase
    volume on day t+L?  One Pearson r per lag L ∈ [−max_lag, +max_lag];
    the argmax lag is the empirical conversion delay a marketing /
    attribution model would seed from (the sample CCF of classic
    Box-Jenkins identification).

    Plan: the fact log aggregates to (type, day) grain FIRST — the one
    at-scale shuffle — then each side is a |days|-row series; the x side
    explodes IN-ROW over the 2·max_lag+1 literal lags (no lag-spine
    join, nothing for lint rule 5 to prove) and equi-joins the
    broadcast y side on the shifted date.  Moments fold per lag in one
    |lags|-row aggregate.

    Determinism: the events_cuped moment discipline — n, Σx, Σy, Σxy,
    Σx², Σy² are exact bigints in any partition order; r applies the
    textbook fixed-order IEEE expression once per lag, 6-dp rounded.
    Lags where either series is constant (zero variance) or where the
    overlap is shorter than ``XCORR_MIN_DAYS`` are excluded in both
    engines — a 2-point overlap correlates at ±1 by construction, so
    reporting it would be noise dressed as signal.

    Output: (lag_days, n_days, sum_x, sum_y, r) — one row per lag with
    nonzero variance on both sides."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin(x_type, y_type))
        .groupBy(F.col("event_type"), F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    xs = daily.filter(F.col("event_type") == x_type).select(
        "day", F.col("c").alias("x")
    )
    ys = daily.filter(F.col("event_type") == y_type).select(
        F.col("day").alias("y_day"), F.col("c").alias("y")
    )
    lags = F.array([F.lit(l) for l in range(-max_lag, max_lag + 1)])
    xl = xs.select("day", "x", F.explode(lags).alias("lag_days"))
    j = xl.join(
        F.broadcast(ys),
        F.col("y_day") == F.date_add(F.col("day"), F.col("lag_days")),
    )
    m = j.groupBy("lag_days").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = m["n_days"] * m["sxx"] - m["sum_x"] * m["sum_x"]
    vy = m["n_days"] * m["syy"] - m["sum_y"] * m["sum_y"]
    return (
        m.filter((vx > 0) & (vy > 0) & (m["n_days"] >= XCORR_MIN_DAYS))
        .select(
            "lag_days",
            "n_days",
            "sum_x",
            "sum_y",
            F.round(
                (m["n_days"] * m["sxy"] - m["sum_x"] * m["sum_y"])
                / F.sqrt(
                    (vx).cast("double") * (vy).cast("double")
                ),
                6,
            ).alias("r"),
        )
    )


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS of each event type's arrival process: the Goh-Barabási
    coefficient B = (σ−μ)/(σ+μ) over inter-event gaps (B → −1 periodic,
    0 Poisson, → 1 bursty) — the one-number arrival-shape diagnostic
    behind capacity planning and anomaly baselines, complementing
    ``events_autocorrelation`` (which sees daily counts, not gap
    texture).

    Plan: one log shuffle for the per-type lag window ((ts, event_id)
    total order), then gap moments fold to a |types|-row report.

    Determinism: gaps are exact integer seconds; the moments accumulate
    as DOUBLES (a µs² integer product overflows bigint — the
    dim_stats float-moment envelope applies instead: ulp noise far
    below the 6-dp rounding); μ, σ and B are fixed-order IEEE
    expressions the oracle mirrors.

    Output: (event_type, n_gaps, mean_gap_s, burstiness)."""
    from ..functions.time_utils import epoch_seconds

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", epoch_seconds(F.col("ts")).alias("sec"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).cast("double").alias("gap"),
    ).filter(F.col("gap").isNotNull())
    m = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    )
    n, s1, s2 = F.col("n_gaps"), F.col("s1"), F.col("s2")
    mu = s1 / n
    sigma = F.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
    return m.filter(F.col("n_gaps") >= 2).select(
        "event_type",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )
