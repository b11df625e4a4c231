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
    lift), pairs with part_a < part_b."""
    li = (
        read_table(spark, sf_dir, "lineitem", spread=True)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    sized = li.groupBy("o").agg(F.count("*").alias("w"))
    li = li.join(
        F.broadcast(sized.filter(F.col("w") > max_order_items).select("o")),
        "o",
        "left_anti",
    ).persist()
    # persisted: the filtered basket table feeds the scalar count, the
    # item counts AND both sides of the pair self-join (the cache is the
    # single-job stand-in for the written intermediate a production DAG
    # would materialize)
    n_baskets = li.select("o").distinct().count()  # one scalar, plan constant
    item = li.groupBy("p").agg(F.count("*").alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
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
                F.col("n_ab") * F.lit(int(n_baskets)) / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
    return out


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
