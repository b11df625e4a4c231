"""Classic warehouse-benchmark query shapes over the TPC-H-ish tables.

The testdata star schema (TESTDATA.md) is TPC-H-shaped, so the canonical
decision-support patterns belong in the engine's surface alongside the
reference-derived marts: the wide-aggregate pricing summary (Q1's
family), the top-k revenue join (Q3's), the min-cost-supplier ranking
(Q2's), and market-basket association rules (the classic co-occurrence
mining one step past ``events_session_cooccurrence``'s pair lift).

Exactness discipline (the repo contract for money columns): every sum is
an integer — prices in round(·100) CENTS, discount/tax percents as
round(·100) integers, so products like price·(1−disc) become exact
bigint products at a documented fixed-point scale — and every ratio is
one IEEE division of exact operands.  A raw double sum would be
partial-order-dependent and break cross-engine hash parity.

Scale notes per operator in the docstrings; the shared shape: one
fact-side shuffle at most, micro-dims broadcast, group keys of low
cardinality with full map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..sources.tables import read_table

# fixed analysis dates (the injected-literal discipline of RUN_DATE:
# both engines must see the same constants or hashes can never match).
# The order/ship dates in the testdata span the classic TPC-H 1995-2001
# range, so the benchmark's own constants apply.
PRICING_CUTOFF = "1998-09-02"   # Q1-style: ship dates at/before this
UNSHIPPED_DATE = "1996-03-15"   # Q3-style: ordered before, shipped after
BASKET_MIN_SUPPORT = 2          # rules must recur to be rules
BASKET_MAX_ORDER_ITEMS = 16     # same quadratic-block guard as triangles


def _cents(col: str) -> Column:
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> Column:
    return F.round(F.col(col) * 100).cast("long")


def lineitem_pricing_summary(
    spark: SparkSession, sf_dir: str, cutoff: str = PRICING_CUTOFF
) -> DataFrame:
    """TPC-H Q1's shape: the wide pricing summary per (returnflag,
    linestatus) over shipped lineitems — the benchmark's canonical
    scan-heavy aggregate (one pass, one tiny group key, every metric a
    map-side-combinable partial).

    disc_price = price·(1−disc) and charge = disc_price·(1+tax) are
    computed as exact integer products at fixed-point scale: cents ×
    (100−disc_pct) [scale 10⁻⁴] and cents × (100−d) × (100+t)
    [scale 10⁻⁶].  The averages are single divisions of exact sums.

    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_price_e4, sum_charge_e6, avg_qty, avg_price_cents,
    count_order)."""
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .filter(F.to_date("l_shipdate") <= F.lit(cutoff).cast("date"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            _cents("l_extendedprice").alias("cents"),
            _pct("l_discount").alias("d"),
            _pct("l_tax").alias("t"),
        )
    )
    disc_e4 = F.col("cents") * (F.lit(100) - F.col("d"))
    charge_e6 = disc_e4 * (F.lit(100) + F.col("t"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("cents").alias("sum_base_cents"),
            F.sum(disc_e4).alias("sum_disc_price_e4"),
            F.sum(charge_e6).alias("sum_charge_e6"),
            (F.sum("qty") / F.count("*")).alias("avg_qty"),
            (F.sum("cents") / F.count("*")).alias("avg_price_cents"),
            F.count("*").alias("count_order"),
        )
    )


def orders_top_revenue_unshipped(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    date: str = UNSHIPPED_DATE,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3's shape: the k highest-revenue orders from one customer
    segment that were placed before ``date`` but still shipping after it
    — fact⋈fact⋈dim with a selective filter on every input.

    Scale shape: both date filters and the segment filter push to the
    scans (segment prunes customer BEFORE it broadcasts); lineitem⋈orders
    is the one fact shuffle (AQE broadcasts orders' filtered survivors
    when small); revenue sums exact integer cents×(100−d).  The final
    top-k is a total order (revenue desc, orderdate asc, orderkey asc) —
    deterministic LIMIT in both engines.

    Output: (o_orderkey, o_orderdate, o_orderpriority, revenue_e4)."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    orders = (
        read_table(spark, sf_dir, "orders", spread=True)
        .filter(F.to_date("o_orderdate") < F.lit(date).cast("date"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .filter(F.to_date("l_shipdate") > F.lit(date).cast("date"))
        .select(
            "l_orderkey",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
                "rev_e4"
            ),
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(k)
    )


def part_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape: for every part, the supplier observed offering
    it cheapest (min lineitem price in exact cents; ties to the lower
    suppkey), labeled through the supplier→nation dims.

    Scale shape: the (part, supplier) pre-aggregate is the one fact
    shuffle and collapses the fact to ≤ |part|×|supplier observed|
    rows BEFORE the per-part ranking window — aggregate-first,
    window-second (the repo's standard two-phase shape); supplier and
    nation broadcast.

    Output: (p_partkey, p_name, s_name, nation_name, best_cents)."""
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("cents")
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("cents").alias("best_cents")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("best_cents"), F.asc("l_suppkey")
    )
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation_name"),
            "best_cents",
        )
    )


LARGE_VOLUME_MIN_QTY = 300      # Q18's own constant; ~0.1% of orders
LAPSED_CUTOFF = "2000-01-01"    # Q22-shape recency bar (orders span →2001-08)


def part_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape: revenue locked in "small" lineitems — lines
    whose quantity is below 20% of their part's average order quantity.
    The benchmark's canonical CORRELATED SCALAR SUBQUERY
    (``l_quantity < 0.2 * (select avg(l_quantity) ... same part)``),
    decorrelated the way Catalyst/any planner must: a per-part
    aggregate joined back to the fact on the same key.

    Exactness discipline: the 20%-of-average predicate is evaluated in
    integers — ``qty < avg/5  ⟺  5·qty·n_lines < sum_qty`` — so both
    engines compare the same bigints and no float threshold can straddle
    a boundary.  Revenue sums exact cents.

    Scale shape: the per-part aggregate is one fact shuffle on
    l_partkey; the join back to lineitem reuses the same key, so AQE
    plans it against the already-partitioned exchange (and the
    aggregate side is |part|-sized — broadcastable when parts are few).
    Output: (p_brand, n_small_lines, small_rev_cents) — per-brand so
    the answer exercises a dim broadcast too."""
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("cents"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("n_li")
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    small = li.join(per_part, "l_partkey").filter(
        F.col("qty") * 5 * F.col("n_li") < F.col("sum_qty")
    )
    return (
        small.join(F.broadcast(part), small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_lines"),
            F.sum("cents").alias("small_rev_cents"),
        )
    )


def orders_large_volume(
    spark: SparkSession, sf_dir: str, min_qty: int = LARGE_VOLUME_MIN_QTY
) -> DataFrame:
    """TPC-H Q18's shape: the large-volume orders — orders whose total
    quantity reaches ``min_qty``, labeled with their customer.  The
    benchmark's canonical HAVING-subquery semi-join
    (``o_orderkey in (select l_orderkey ... having sum(qty) > T)``):
    aggregate the fact FIRST, and only the tiny qualifying key set
    drives the joins.

    Scale shape: one fact shuffle (the per-order sum with map-side
    combine); the ~0.1%-selective HAVING survivor set then joins orders
    (broadcastable survivors) and the customer dim.  Output: (c_name,
    c_custkey, o_orderkey, o_orderdate, total_qty)."""
    per_order = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") >= min_qty)
    )
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


LATE_SHIP_DAYS = 90             # Q4-shape lateness bar


def orders_priority_late_ship(
    spark: SparkSession, sf_dir: str, late_days: int = LATE_SHIP_DAYS
) -> DataFrame:
    """TPC-H Q4's shape: order counts per priority class, restricted to
    orders where EXISTS a lineitem shipped more than ``late_days`` after
    the order date — the benchmark's canonical EXISTS correlated
    subquery, planned as a LEFT SEMI join (each order counted once no
    matter how many late lines; the testdata has no commit/receipt
    dates, so lateness is measured against the order date).

    Scale shape: the semi-join is key-equi on orderkey with the
    date-lateness residual; Spark ships only (l_orderkey, l_shipdate)
    from the fact, the semi form stops probing an order at its first
    late line, and the final aggregate is a 5-row map-side-combinable
    count.  Output: (o_orderpriority, n_orders)."""
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.sd > F.date_add(orders.od, late_days)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def customers_idle_high_balance(
    spark: SparkSession, sf_dir: str, lapsed_cutoff: str = LAPSED_CUTOFF
) -> DataFrame:
    """TPC-H Q22's shape: per-nation count and balance of customers who
    hold an above-average positive account balance yet have placed NO
    order since ``lapsed_cutoff`` — the benchmark's canonical
    GLOBAL-SCALAR-SUBQUERY + NOT-EXISTS anti-join ("who has money
    parked here and stopped buying?").  The testdata's customers all
    have SOME order, so Q22's literal "no orders ever" is vacuous; the
    recency cutoff keeps the anti-join shape with a real survivor set.

    Exactness discipline: the above-average predicate is integer-exact —
    ``bal > sum_pos/n_pos  ⟺  bal_cents·n_pos > sum_pos_cents`` — one
    bigint comparison in both engines, no float average.

    Scale shape: the scalar aggregate is one tiny job over the customer
    dim; the anti-join streams the date-pruned orders' custkeys against
    the filtered (small) customer side — Spark plans it broadcast-anti
    when the survivors fit, shuffle-anti beyond; nation broadcasts.
    Output: (nation_name, n_cust, sum_bal_cents)."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_cents")
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_pos"), F.count("*").alias("n_pos")
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos")
    )
    recent = (
        read_table(spark, sf_dir, "orders", spread=True)
        .filter(F.to_date("o_orderdate") >= F.lit(lapsed_cutoff).cast("date"))
        .select("o_custkey")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("bal_cents").alias("sum_bal_cents"),
        )
    )


def orders_basket_rules(
    spark: SparkSession,
    sf_dir: str,
    min_support: int = BASKET_MIN_SUPPORT,
    max_order_items: int = BASKET_MAX_ORDER_ITEMS,
) -> DataFrame:
    """Market-basket association rules over ORDER baskets: for part
    pairs co-purchased in ≥ ``min_support`` orders, both direction
    confidences and the lift — the rule-mining step past
    ``events_session_cooccurrence``'s pair counts (and the classic
    a-priori output for the support-2 frontier).

    Scale shape: within-order pairing is bounded by the same
    ``max_order_items`` quadratic-block guard as the triangle counter
    (a W-item order contributes W·(W−1)/2 pairs); pair counts, item
    counts and the basket total are all integers, and confidence/lift
    are single divisions of exact operands.

    Output: (part_a, part_b, n_ab, n_a, n_b, conf_a_to_b, conf_b_to_a,
    lift), pairs with part_a < part_b.

    Build shape (round 11, the ``copurchase_edges`` round-8 rewire
    applied here): ONE groupBy(order) → sorted distinct item array
    replaces the distinct + size-count + anti-join + per-order
    self-join pipeline — the size gate reads the array length, pairs
    explode in-row (index pairs i < j over the sorted array, so
    part_a < part_b holds by construction), and the same persisted
    basket table feeds the scalar basket count and the item counts.
    Saves three shuffles (distinct, size aggregate, the join's second
    exchange); output is row-identical (same gate, same pair set).
    Unlike the graph edge build, single-item baskets are KEPT in the
    basket/item counts — they only drop out of pairing, exactly as
    they produced no self-join rows before."""
    grouped = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
        .filter(F.size("ps") <= max_order_items)
        .persist()
    )
    try:
        n_baskets = grouped.count()  # one scalar, plan constant; also
        # materializes the cache before its three consumers fan out
        item = (
            grouped.select(F.explode("ps").alias("p"))
            .groupBy("p")
            .agg(F.count("*").alias("n_item"))
        )
        pairs = (
            grouped.filter(F.size("ps") >= 2)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.slice("ps", 1, F.size("ps") - 1),
                            lambda x, i: F.transform(
                                F.slice(F.col("ps"), i + 2, F.size("ps")),
                                lambda y: F.struct(x.alias("x"), y.alias("y")),
                            ),
                        )
                    )
                ).alias("e")
            )
            .groupBy(F.col("e.x").alias("part_a"), F.col("e.y").alias("part_b"))
            .agg(F.count("*").alias("n_ab"))
            .filter(F.col("n_ab") >= min_support)
        )
        out = (
            pairs.join(
                item.select(F.col("p").alias("part_a"), F.col("n_item").alias("n_a")),
                "part_a",
            )
            .join(
                item.select(F.col("p").alias("part_b"), F.col("n_item").alias("n_b")),
                "part_b",
            )
            .select(
                "part_a",
                "part_b",
                "n_ab",
                "n_a",
                "n_b",
                (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
                (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
                (
                    F.col("n_ab")
                    * F.lit(int(n_baskets))
                    / (F.col("n_a") * F.col("n_b"))
                ).alias("lift"),
            )
        )
        # pin the (rule-grain, support-pruned) report so the basket cache
        # releases — the previous form leaked its persisted table per call
        return out.localCheckpoint(eager=True)
    finally:
        grouped.unpersist()


def nation_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5's shape: revenue from lineitems where the CUSTOMER and
    the SUPPLIER sit in the same nation — the benchmark's signature
    six-way join whose defining twist is the non-hierarchical equality
    c_nationkey = s_nationkey (two independent dimension paths must
    agree, so the planner can't just snowflake down one chain).

    Scale shape: lineitem⋈orders is the one fact⋈fact shuffle on
    orderkey; customer and supplier broadcast onto opposite ends and
    the nation-equality residual filters at join time (never a
    post-join cartesian); revenue sums exact integer cents×(100−d).
    Output: (nation_name, n_lineitems, revenue_e4)."""
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("cn")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("sn")
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("sn") == F.col("cn")),
        )
        .join(F.broadcast(nation), F.col("sn") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum("rev_e4").alias("revenue_e4"),
        )
    )


RETURNED_TOP_K = 20


def customers_returned_revenue(
    spark: SparkSession, sf_dir: str, k: int = RETURNED_TOP_K
) -> DataFrame:
    """TPC-H Q10's shape: the ``k`` customers who returned the most
    revenue (returnflag = 'R') — the classic "who should account
    management call" report: selective fact filter, two joins, exact
    money ranking with a total-order deterministic LIMIT.

    Scale shape: the returnflag filter pushes to the lineitem scan (≈⅓
    survives), the per-customer aggregate collapses the fact BEFORE the
    dim joins, and the top-k total order (revenue desc, custkey asc) is
    engine-agnostic.  Output: (c_custkey, c_name, nation_name,
    n_returned_items, returned_rev_e4)."""
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
                "rev_e4"
            ),
        )
    )
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").alias("n_returned_items"),
            F.sum("rev_e4").alias("returned_rev_e4"),
        )
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(F.broadcast(cust), "c_custkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            "n_returned_items",
            "returned_rev_e4",
        )
        .orderBy(F.desc("returned_rev_e4"), F.asc("c_custkey"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# The remaining canonical shapes (Q6/7/8/9/11/12/13/14/15/16/19/20/21
# families), adapted to the testdata star schema: no partsupp table
# (lineitem's (partkey, suppkey) observations stand in for the supply
# relation, as part_min_cost_supplier already established), no
# commit/receipt dates (lateness is ship − order date, as
# orders_priority_late_ship established), no shipmode/container/comment
# columns (l_linestatus, p_size bands and balance signs stand in for
# the categorical filters).  The SHAPES — not the literal predicates —
# are the engine capabilities under test.

FORECAST_YEAR = "1996-01-01"        # Q6 window [year, year+1)
FORECAST_DISC_LO, FORECAST_DISC_HI = 5, 7   # discount band, pct points
FORECAST_MAX_QTY = 24
VOLUME_NATION_A = "NATION_1"        # Q7 trading pair
VOLUME_NATION_B = "NATION_2"
MKT_SHARE_REGION = "ASIA"           # Q8 market
MKT_SHARE_NATION = "NATION_2"       # Q8 subject nation (an ASIA member)
MKT_SHARE_TYPE = "ECONOMY"          # Q8 part-type market segment
PROFIT_NAME_WORD = "red"            # Q9 part-name LIKE word
VALUE_NATION = "NATION_3"           # Q11 scoped nation
VALUE_FRACTION_DEN = 1000           # Q11 threshold: > total/1000
LATE_MODE_DAYS = 60                 # Q12 lateness bar
DIST_EXCLUDED_PRIORITY = "5-LOW"    # Q13 order-exclusion filter
TOP_SUPPLIER_QUARTER = "1996-01-01"  # Q15 3-month window start
DIVERSITY_EXCL_BRAND = "Brand#1"    # Q16 exclusions
DIVERSITY_EXCL_TYPE = "PROMO"
DIVERSITY_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)
EXCESS_NAME_WORD = "small"          # Q20 part-name LIKE word
EXCESS_SHARE_MULT = 2               # Q20 dominance: > 2× the uniform share
WAITING_LATE_DAYS = 90              # Q21 lateness bar


def lineitem_revenue_forecast(
    spark: SparkSession, sf_dir: str, year_start: str = FORECAST_YEAR
) -> DataFrame:
    """TPC-H Q6's shape: the what-if revenue delta from eliminating a
    narrow discount band — a pure scan-side aggregate with THREE
    range predicates and no join at all.  The capability under test is
    predicate pushdown: all three filters (ship year, discount band,
    quantity cap) must reach the parquet scan, and the whole query is
    one map-side-combinable partial sum over the survivors.

    forecast = Σ price·disc in exact e4 fixed point (cents × pct).
    Output: one row (n_lines, forecast_rev_e4)."""
    lo = F.lit(year_start).cast("date")
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .filter(
            (F.to_date("l_shipdate") >= lo)
            & (F.to_date("l_shipdate") < F.add_months(lo, 12))
        )
        .select(
            _cents("l_extendedprice").alias("cents"),
            _pct("l_discount").alias("d"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .filter(
            (F.col("d") >= FORECAST_DISC_LO)
            & (F.col("d") <= FORECAST_DISC_HI)
            & (F.col("qty") < FORECAST_MAX_QTY)
        )
    )
    return li.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("cents") * F.col("d")).alias("forecast_rev_e4"),
    )


def nation_volume_shipping(
    spark: SparkSession,
    sf_dir: str,
    nation_a: str = VOLUME_NATION_A,
    nation_b: str = VOLUME_NATION_B,
) -> DataFrame:
    """TPC-H Q7's shape: shipping volume BETWEEN two nations, by
    direction and ship year — the bidirectional-pair join where the
    supplier's nation and the customer's nation must form the unordered
    pair {A, B} in either orientation.

    Scale shape: lineitem⋈orders is the one fact shuffle; customer and
    supplier (pre-filtered to the two nations — the filter prunes
    BEFORE the broadcast) broadcast onto it, and the cross-nation
    inequality is a join-time residual.  Revenue exact e4.
    Output: (supp_nation, cust_nation, ship_year, n_lines,
    revenue_e4) — 2 directions × observed years."""
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        "l_suppkey",
        F.year(F.to_date("l_shipdate")).alias("ship_year"),
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("rev_e4").alias("revenue_e4"),
        )
    )


def nation_market_share(
    spark: SparkSession,
    sf_dir: str,
    region: str = MKT_SHARE_REGION,
    nation: str = MKT_SHARE_NATION,
    part_type: str = MKT_SHARE_TYPE,
) -> DataFrame:
    """TPC-H Q8's shape: one nation's share of a region's market for
    one part type, per order year — the conditional-aggregate ratio
    (numerator = a CASE inside the sum, denominator = the same sum
    unconditioned) that turns "market share" into a single grouped
    pass over the joined fact.

    Scale shape: part (type-filtered) and the region-pruned customer
    side broadcast; lineitem⋈orders is the one fact shuffle; share is
    ONE division of two exact e4 sums per year.
    Output: (o_year, total_rev_e4, nation_rev_e4, mkt_share)."""
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == region)
        .select("r_regionkey")
    )
    mkt_cust = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == part_type)
        .select("p_partkey")
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_custkey", F.year(F.to_date("o_orderdate")).alias("o_year")
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(mkt_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == nation, F.col("rev_e4")).otherwise(F.lit(0))
    )
    return joined.groupBy("o_year").agg(
        F.sum("rev_e4").alias("total_rev_e4"),
        nation_rev.alias("nation_rev_e4"),
        (nation_rev / F.sum("rev_e4")).alias("mkt_share"),
    )


def nation_product_profit(
    spark: SparkSession, sf_dir: str, name_word: str = PROFIT_NAME_WORD
) -> DataFrame:
    """TPC-H Q9's shape: profit on one product line per (supplier
    nation, order year).  The testdata has no partsupp.ps_supplycost,
    so cost is proxied by the part's retail price × quantity (the Q9
    capability under test — a LIKE-filtered dim driving a multi-join
    profit expression with a possibly-negative measure — is intact).

    profit_e4 = Σ [cents·(100−d) − qty·retail_cents·100]: both terms at
    e4 scale, exact bigints, sign-mixed.  Scale shape: the LIKE filter
    prunes part BEFORE its broadcast; lineitem⋈orders is the one fact
    shuffle; supplier/nation broadcast.
    Output: (nation_name, o_year, n_lines, profit_e4)."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{name_word}%"))
        .select("p_partkey", _cents("p_retailprice").alias("retail_cents"))
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("o_year")
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("cents"),
        _pct("l_discount").alias("d"),
    )
    profit = F.col("cents") * (F.lit(100) - F.col("d")) - F.col("qty") * F.col(
        "retail_cents"
    ) * F.lit(100)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"), F.col("o_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(profit).alias("profit_e4"),
        )
    )


def nation_part_value_concentration(
    spark: SparkSession,
    sf_dir: str,
    nation: str = VALUE_NATION,
    fraction_den: int = VALUE_FRACTION_DEN,
) -> DataFrame:
    """TPC-H Q11's shape: the parts holding an outsized share of one
    nation's observed supply value — GROUP BY + HAVING against a
    GLOBAL scalar subquery over the SAME scoped relation (the planner
    must evaluate the filtered aggregate twice or share the scan).

    The supply relation is lineitem's observed (part, supplier) flows
    (no partsupp in the testdata); value = Σ extendedprice in cents.
    The threshold ``value > total/fraction_den`` is evaluated in exact
    integers: ``value·fraction_den > total``.

    Scale shape: ONE shuffle builds the per-part values (the nation
    filter pruned the fact at scan time via the broadcast supplier
    semi-join); the scalar total folds off the same aggregate and rides
    back as a one-row broadcast — the scoped scan happens once.
    Output: (p_partkey, value_cents) for survivors."""
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                read_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", _cents("l_extendedprice").alias("cents"))
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("cents").alias("value_cents"))
    per_part = per_part.persist()  # one scan feeds both the total and the filter
    try:
        total = per_part.agg(F.sum("value_cents").alias("total_cents"))
        out = (
            per_part.crossJoin(F.broadcast(total))
            .filter(F.col("value_cents") * fraction_den > F.col("total_cents"))
            .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        )
        # survivors are bounded at fraction_den-1 rows (each holds more
        # than a 1/fraction_den share): pin them, then drop the cache
        return out.localCheckpoint(eager=True)
    finally:
        per_part.unpersist()


def lineitem_late_shipment_modes(
    spark: SparkSession, sf_dir: str, late_days: int = LATE_MODE_DAYS
) -> DataFrame:
    """TPC-H Q12's shape: late shipments bucketed by category, counting
    critical-priority vs other orders per bucket — the CASE-driven
    conditional count pair over a fact⋈fact join.  The testdata has no
    l_shipmode; l_linestatus is the stand-in category, and lateness is
    ship > order date + ``late_days`` (no commit/receipt dates).

    Scale shape: the lateness predicate is a join residual (only
    orderkey + two dates ship through the shuffle); the two CASE counts
    are one grouped pass, 2 output rows, full map-side combine.
    Output: (l_linestatus, high_line_count, low_line_count)."""
    orders = read_table(spark, sf_dir, "orders", spread=True).select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_orderkey", "l_linestatus", F.to_date("l_shipdate").alias("sd")
    )
    late = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey)
        & (li.sd > F.date_add(orders.od, late_days)),
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


def customer_order_distribution(
    spark: SparkSession, sf_dir: str, excluded_priority: str = DIST_EXCLUDED_PRIORITY
) -> DataFrame:
    """TPC-H Q13's shape: the distribution of customers by how many
    qualifying orders they placed — the LEFT OUTER join whose unmatched
    side MUST survive as count 0, then a second aggregation over the
    first's result (the histogram-of-a-histogram).

    Scale shape: orders are filtered at scan (the NOT LIKE analogue:
    one priority class excluded), the outer join aggregates to
    |customer| rows, and the second groupBy is over ≤ max-order-count
    distinct keys — tiny.  Output: (c_count, custdist)."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        read_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_orderpriority") != excluded_priority)
        .select("o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14's shape: the share of revenue from promotional parts,
    per ship month — the conditional-sum ratio joined through a dim
    (p_type = 'PROMO' exists verbatim in the testdata).  Q14 fixes one
    month; grouping by every ship month exercises the identical shape
    with a fuller result.

    Scale shape: part broadcasts (2 columns); one grouped pass; share
    is ONE division of two exact e4 sums per month.
    Output: (ship_month, promo_rev_e4, total_rev_e4, promo_share)."""
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey",
        F.date_trunc("month", F.to_date("l_shipdate")).cast("date").alias(
            "ship_month"
        ),
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("ship_month")
        .agg(
            promo.alias("promo_rev_e4"),
            F.sum("rev_e4").alias("total_rev_e4"),
            (promo / F.sum("rev_e4")).alias("promo_share"),
        )
    )


def top_supplier_revenue(
    spark: SparkSession, sf_dir: str, quarter_start: str = TOP_SUPPLIER_QUARTER
) -> DataFrame:
    """TPC-H Q15's shape: the supplier(s) achieving the MAXIMUM revenue
    over a 3-month window — the view-then-scalar-max-equality pattern
    (ties all surface; no arbitrary LIMIT 1).

    Scale shape: one fact shuffle builds per-supplier revenue (~|supplier|
    rows, persisted — the 'view'); the global max folds off it and rides
    back as a one-row broadcast; equality keeps exact-e4 ties.
    Output: (s_suppkey, s_name, total_rev_e4)."""
    lo = F.lit(quarter_start).cast("date")
    per_supp = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .filter(
            (F.to_date("l_shipdate") >= lo)
            & (F.to_date("l_shipdate") < F.add_months(lo, 3))
        )
        .select(
            "l_suppkey",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
                "rev_e4"
            ),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_e4").alias("total_rev_e4"))
        .persist()
    )
    try:
        best = per_supp.agg(F.max("total_rev_e4").alias("max_rev"))
        supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
        out = (
            per_supp.crossJoin(F.broadcast(best))
            .filter(F.col("total_rev_e4") == F.col("max_rev"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev_e4")
        )
        # ties only: pin the handful of max-revenue rows, drop the cache
        return out.localCheckpoint(eager=True)
    finally:
        per_supp.unpersist()


def part_supplier_diversity(
    spark: SparkSession,
    sf_dir: str,
    excl_brand: str = DIVERSITY_EXCL_BRAND,
    excl_type: str = DIVERSITY_EXCL_TYPE,
    sizes: tuple = DIVERSITY_SIZES,
) -> DataFrame:
    """TPC-H Q16's shape: how many distinct suppliers can furnish each
    (brand, type, size) part class, excluding one brand, one type
    family, a size whitelist, and a supplier denylist (NOT IN
    anti-join; balance < 0 is the testdata's complaint analogue).

    The supply relation is lineitem's observed (part, supplier) pairs.
    Scale shape: the part filters prune at scan and broadcast; the
    denylist is a tiny broadcast anti-join; countDistinct shuffles on
    the 3-part group key once.
    Output: (p_brand, p_type, p_size, supplier_cnt)."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != excl_brand)
            & (F.col("p_type") != excl_type)
            & F.col("p_size").isin(*sizes)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def disjunctive_branch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's shape: revenue matched by an OR of three
    independently-conjunctive (brand, size-band, quantity-band)
    branches — the disjunctive-predicate query whose capability under
    test is that the planner pushes the UNION of the branches down as
    ONE scan predicate (not three scans, not a post-join filter).

    The testdata has no container column; p_size bands stand in.  The
    join predicate carries the disjunction: each branch pairs a part
    condition with a lineitem condition, exactly Q19's
    ``(p_brand = .. AND p_size BETWEEN .. AND l_quantity BETWEEN ..)
    OR (..)`` form.  Output: one row (n_lines, revenue_e4)."""
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("qty")
    branch = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 45) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), (li.l_partkey == part.p_partkey) & branch)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("rev_e4").alias("revenue_e4"),
        )
    )


def excess_supply_candidates(
    spark: SparkSession,
    sf_dir: str,
    name_word: str = EXCESS_NAME_WORD,
    share_mult: int = EXCESS_SHARE_MULT,
) -> DataFrame:
    """TPC-H Q20's shape: suppliers who dominate the observed supply of
    a LIKE-filtered product line — the nested-semi-join query ("ship
    excess stock") whose inner threshold is a per-part scalar subquery
    (Q20's 50%-of-availqty analogue, made scale-free: a supplier
    dominates a part when its volume exceeds ``share_mult``× the
    part's UNIFORM per-supplier share — an absolute fraction would go
    vacuous as the supplier count scales with SF).

    Integer-exact threshold: qty(part,supp)·n_suppliers(part) >
    share_mult·qty(part).  Scale shape: the LIKE filter prunes part
    before broadcast; ONE fact shuffle builds (part, supp) volumes;
    the per-part total reuses the same aggregate (a second combine
    over it, not a second scan); the dominance filter is a same-key
    join.  Output: (s_suppkey, s_name, n_dominated_parts)."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{name_word}%"))
        .select("p_partkey")
    )
    ps = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_ps"))
        .persist()
    )
    try:
        per_part = ps.groupBy("l_partkey").agg(
            F.sum("qty_ps").alias("qty_p"), F.count("*").alias("n_supp")
        )
        dominant = ps.join(per_part, "l_partkey").filter(
            F.col("qty_ps") * F.col("n_supp") > F.lit(share_mult) * F.col("qty_p")
        )
        supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
        out = (
            dominant.groupBy("l_suppkey")
            .agg(F.count("*").alias("n_dominated_parts"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "n_dominated_parts")
        )
        # <= |supplier| rows: pin the report, then drop the cache
        return out.localCheckpoint(eager=True)
    finally:
        ps.unpersist()


def suppliers_kept_orders_waiting(
    spark: SparkSession, sf_dir: str, late_days: int = WAITING_LATE_DAYS
) -> DataFrame:
    """TPC-H Q21's shape: per supplier, the count of finalized
    multi-supplier orders where THIS supplier was the ONLY late one —
    the benchmark's hardest correlated pattern (EXISTS another
    supplier's line AND NOT EXISTS another supplier's late line),
    decorrelated into per-order supplier counts: an order qualifies
    for supplier s iff  n_distinct_suppliers ≥ 2  AND
    n_distinct_LATE_suppliers = 1  AND s is that late supplier.

    Lateness is ship > order + ``late_days`` (no receipt/commit dates).
    Scale shape: one orderkey shuffle computes both distinct-supplier
    counts in a single grouped pass (a conditional countDistinct
    pair); late per-(order, supplier) pairs join back on the same key;
    the EXISTS/NOT-EXISTS pair never materializes as self-joins.
    Output: (s_suppkey, s_name, numwait)."""
    orders = (
        read_table(spark, sf_dir, "orders", spread=True)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.to_date("o_orderdate").alias("od"))
    )
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .select("l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("sd"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", F.col("sd") > F.date_add(F.col("od"), late_days))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_pairs = (
        li.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    waiting = late_pairs.join(
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
        "l_orderkey",
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


def customers_reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORDER-CADENCE report: per market segment, the distribution of
    gaps between a customer's consecutive orders — the replenishment
    metric behind inventory planning and churn-risk windows ("a
    BUILDING customer who hasn't ordered in 2× their segment's mean gap
    is lapsing").  The sequence-analytics twin of ``events_retention``
    on the warehouse side of the schema.

    Plan: one orders shuffle hash-partitioned by customer for the lag
    window ((o_orderdate, o_orderkey) total order — ties exist in
    date-grain data), then gaps aggregate straight to the |segments|-row
    report with the micro-dim customer→segment map broadcast.  The
    window never sees an unpartitioned frame.

    Determinism: gaps are exact integer day counts; mean is one IEEE
    division of exact sums, 6-dp rounded.

    Output: (c_mktsegment, n_customers, n_gaps, avg_gap_days,
    min_gap_days, max_gap_days)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od"), "o_orderkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(F.col("od"), F.lag("od").over(w)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_gaps"),
            F.round(F.sum("gap") / F.count("*"), 6).alias("avg_gap_days"),
            F.min("gap").cast("long").alias("min_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
    )


def orders_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULFILLMENT-LATENCY distribution: order-date → ship-date gap per
    order priority — the warehouse SLA report (does URGENT actually ship
    faster, and at which tail percentile does it stop being true).

    Plan: lineitem ⋈ orders on the orderkey both facts are naturally
    keyed by (one co-partitioned shuffle each), integer day gaps, then a
    |priorities|-row exact-percentile aggregate.  Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation
    definition (the events_percentiles precedent), so the report is
    exact and oracle-checkable; at 100 TB the same plan swaps in
    ``approx_percentile``.

    Output: (o_orderpriority, n_items, avg_days, p50, p90, p99)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od"), "o_orderpriority"
    )
    gaps = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "o_orderpriority", F.datediff("ship", "od").alias("gap")
    )
    pct = F.expr("percentile(gap, array(0.5, 0.9, 0.99))")
    return gaps.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("gap") / F.count("*"), 6).alias("avg_days"),
        pct[0].alias("p50"),
        pct[1].alias("p90"),
        pct[2].alias("p99"),
    )


def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLY-CONCENTRATION report: the Herfindahl-Hirschman index of
    supplier revenue shares within each nation — the standard
    concentration measure (HHI = Σ share², monopoly → 1, atomistic →
    1/n) a sourcing or antitrust analysis reads before trusting a
    nation's supply chain; the concentration twin of the Q11 value
    threshold (which finds big PARTS, not lopsided NATIONS).

    Plan: one fact shuffle to (nation, supplier) revenue in exact e4
    fixed-point (the module's cents discipline), the supplier micro-dim
    broadcast, then a |nations|-row aggregate of share squares.

    Determinism: revenues are exact bigints; each share is one IEEE
    division; the Σshare² fold's order noise sits far below the 6-dp
    rounding.

    Output: (n_name, n_suppliers, total_rev_e4, hhi, top_share)."""
    li = read_table(spark, sf_dir, "lineitem", spread=True).select(
        "l_suppkey",
        (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
            "rev_e4"
        ),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_supp = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("rev_e4").alias("rev"))
    )
    tot = Window.partitionBy("s_nationkey")
    shares = per_supp.select(
        "s_nationkey",
        "rev",
        (F.col("rev") / F.sum("rev").over(tot)).alias("share"),
    )
    return (
        shares.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("rev").alias("total_rev_e4"),
            F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "n_suppliers", "total_rev_e4", "hhi", "top_share")
    )
