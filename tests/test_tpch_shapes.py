"""Planted-fixture ground truth for the warehouse-benchmark shapes
(tpch_shapes.py) — hand-computed values, independent of the SQL oracles
(which mirror the same algorithm and could hide a shared bug)."""

from __future__ import annotations

from datetime import datetime


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")


def test_pricing_summary_planted(spark, tmp_path):
    """Two in-window rows in one group + one out-of-window row: exact
    fixed-point sums (cents, cents*(100-d), cents*(100-d)*(100+t)) and
    single-division averages."""
    from spotify_tracks_spark.operators.tpch_shapes import lineitem_pricing_summary

    t_in = datetime(1998, 1, 1)
    t_out = datetime(1999, 1, 1)  # after the 1998-09-02 cutoff
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 10.0, 100.00, 0.10, 0.05, "A", "F", t_in),
        (1, 2, 1, 2, 5.0, 50.00, 0.00, 0.08, "A", "F", t_in),
        (2, 3, 1, 1, 7.0, 70.00, 0.02, 0.01, "A", "F", t_out),
    ])
    rows = lineitem_pricing_summary(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.l_returnflag, r.l_linestatus) == ("A", "F")
    assert r.sum_qty == 15
    assert r.sum_base_cents == 15000  # 10000 + 5000
    # 10000*(100-10) + 5000*(100-0) = 900000 + 500000
    assert r.sum_disc_price_e4 == 1_400_000
    # 900000*105 + 500000*108
    assert r.sum_charge_e6 == 94_500_000 + 54_000_000
    assert r.avg_qty == 7.5
    assert r.avg_price_cents == 7500.0
    assert r.count_order == 2


def test_min_cost_supplier_planted(spark, tmp_path):
    """Cheapest supplier per part; a price tie breaks to the LOWER
    suppkey."""
    from spotify_tracks_spark.operators.tpch_shapes import part_min_cost_supplier

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 2, 1, 1.0, 20.00, 0.0, 0.0, "N", "O", t),   # part 1, supp 2 @ 2000
        (2, 1, 1, 1, 1.0, 10.00, 0.0, 0.0, "N", "O", t),   # part 1, supp 1 @ 1000
        (3, 2, 3, 1, 1.0, 30.00, 0.0, 0.0, "N", "O", t),   # part 2, supp 3 @ 3000
        (4, 2, 1, 1, 1.0, 30.00, 0.0, 0.0, "N", "O", t),   # tie: supp 1 wins
    ])
    spark.createDataFrame(
        [(1, "part one"), (2, "part two")], "p_partkey long, p_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(1, "S1", 0), (2, "S2", 1), (3, "S3", 2)],
        "s_suppkey long, s_name string, s_nationkey int",
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(0, "N0"), (1, "N1"), (2, "N2")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/nation.parquet")

    got = {
        r.p_partkey: (r.s_name, r.nation_name, r.best_cents)
        for r in part_min_cost_supplier(spark, str(tmp_path)).collect()
    }
    assert got == {1: ("S1", "N0", 1000), 2: ("S1", "N0", 3000)}


def test_basket_rules_planted(spark, tmp_path):
    """Baskets {A,B,C}, {A,B}, {A,C}: AB and AC recur (support 2), BC
    does not; confidences and lift are exact small fractions."""
    from spotify_tracks_spark.operators.tpch_shapes import orders_basket_rules

    t = datetime(1997, 6, 1)
    A, B, C = 11, 22, 33
    baskets = {1: [A, B, C], 2: [A, B], 3: [A, C]}
    rows = [
        (o, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", t)
        for o, parts in baskets.items()
        for p in parts
    ]
    _write_lineitem(spark, tmp_path, rows)
    got = {
        (r.part_a, r.part_b): (
            r.n_ab, r.n_a, r.n_b, r.conf_a_to_b, r.conf_b_to_a, r.lift
        )
        for r in orders_basket_rules(spark, str(tmp_path)).collect()
    }
    # n_baskets = 3; A in 3, B in 2, C in 2
    assert got == {
        (A, B): (2, 3, 2, 2 / 3, 1.0, 2 * 3 / (3 * 2)),
        (A, C): (2, 3, 2, 2 / 3, 1.0, 2 * 3 / (3 * 2)),
    }


def test_top_unshipped_is_deterministic_topk(spark, tmp_path):
    """Segment + both date filters + exact revenue ranking: only the
    qualifying order appears, revenue = cents*(100-d) summed."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        orders_top_revenue_unshipped,
    )

    before = datetime(1996, 1, 1)
    after = datetime(1996, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", after),  # qualifies
        (1, 2, 1, 2, 1.0, 50.00, 0.00, 0.0, "N", "O", after),   # same order
        (2, 3, 1, 1, 1.0, 900.00, 0.00, 0.0, "N", "O", before), # shipped early
        (3, 4, 1, 1, 1.0, 900.00, 0.00, 0.0, "N", "O", after),  # wrong segment
    ])
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], "c_custkey long, c_mktsegment string"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [
            (1, 1, datetime(1996, 1, 5), "1-URGENT"),
            (2, 1, datetime(1996, 1, 5), "1-URGENT"),
            (3, 2, datetime(1996, 1, 5), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")

    rows = orders_top_revenue_unshipped(spark, str(tmp_path)).collect()
    assert [(r.o_orderkey, r.revenue_e4) for r in rows] == [
        (1, 10000 * 90 + 5000 * 100)
    ]


def test_small_qty_revenue_planted(spark, tmp_path):
    """Q17 shape: the 20%-of-average predicate in its exact integer form
    (5·qty·n < sum_qty).  Part 1 (qty 1,10,10,10: sum 31, n 4) — only
    the qty-1 line satisfies 20 < 31; part 2 (qty 5,5) has none."""
    from spotify_tracks_spark.operators.tpch_shapes import part_small_qty_revenue

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 12.34, 0.0, 0.0, "N", "O", t),    # the small line
        (2, 1, 1, 1, 10.0, 100.00, 0.0, 0.0, "N", "O", t),
        (3, 1, 1, 1, 10.0, 100.00, 0.0, 0.0, "N", "O", t),
        (4, 1, 1, 1, 10.0, 100.00, 0.0, 0.0, "N", "O", t),
        (5, 2, 1, 1, 5.0, 50.00, 0.0, 0.0, "N", "O", t),
        (6, 2, 1, 1, 5.0, 50.00, 0.0, 0.0, "N", "O", t),
    ])
    spark.createDataFrame(
        [(1, "BRAND#1"), (2, "BRAND#2")], "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")

    rows = part_small_qty_revenue(spark, str(tmp_path)).collect()
    assert [(r.p_brand, r.n_small_lines, r.small_rev_cents) for r in rows] == [
        ("BRAND#1", 1, 1234)
    ]


def test_large_volume_planted(spark, tmp_path):
    """Q18 shape: only the order whose summed quantity reaches the bar
    survives the HAVING semi-join, labeled with its customer."""
    from spotify_tracks_spark.operators.tpch_shapes import orders_large_volume

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 150.0, 1.0, 0.0, 0.0, "N", "O", t),
        (1, 2, 1, 2, 160.0, 1.0, 0.0, 0.0, "N", "O", t),   # order 1: 310
        (2, 3, 1, 1, 100.0, 1.0, 0.0, 0.0, "N", "O", t),   # order 2: 100
    ])
    spark.createDataFrame(
        [(1, 7, datetime(1997, 1, 5)), (2, 8, datetime(1997, 1, 6))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(7, "Alice"), (8, "Bob")], "c_custkey long, c_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")

    rows = orders_large_volume(spark, str(tmp_path)).collect()
    assert [(r.c_name, r.o_orderkey, r.total_qty) for r in rows] == [
        ("Alice", 1, 310)
    ]


def test_idle_high_balance_planted(spark, tmp_path):
    """Q22 shape: integer above-average predicate (bal·n_pos > sum_pos:
    400·4 and 600·4 beat 1300; 100/200 don't) then the recency anti-join
    keeps only the rich customer whose orders all predate the cutoff."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        customers_idle_high_balance,
    )

    spark.createDataFrame(
        [(1, 0, 1.00), (2, 0, 2.00), (3, 1, 4.00), (4, 1, 6.00)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [
            (1, 3, datetime(2000, 5, 1)),   # cust 3 ordered AFTER the bar
            (2, 4, datetime(1999, 1, 1)),   # cust 4 lapsed
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(0, "N0"), (1, "N1")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/nation.parquet")

    rows = customers_idle_high_balance(spark, str(tmp_path)).collect()
    assert [(r.nation_name, r.n_cust, r.sum_bal_cents) for r in rows] == [
        ("N1", 1, 600)
    ]


def test_priority_late_ship_planted(spark, tmp_path):
    """Q4 shape: EXISTS counts each order ONCE however many late lines
    it has; on-time orders never appear."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        orders_priority_late_ship,
    )

    od = datetime(1997, 1, 1)
    late = datetime(1997, 6, 1)     # > 90 days after od
    ontime = datetime(1997, 2, 1)   # within 90 days
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),   # 2nd late line
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ontime),
    ])
    spark.createDataFrame(
        [(1, "1-URGENT", od), (2, "1-URGENT", od)],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")

    rows = orders_priority_late_ship(spark, str(tmp_path)).collect()
    assert [(r.o_orderpriority, r.n_orders) for r in rows] == [("1-URGENT", 1)]


def test_local_supplier_revenue_planted(spark, tmp_path):
    """Only the lineitem whose customer and supplier share a nation
    contributes; revenue is exact cents x (100 - disc)."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        nation_local_supplier_revenue,
    )

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", t),  # supp 1 (N0) = cust nation
        (1, 2, 2, 2, 1.0, 50.00, 0.00, 0.0, "N", "O", t),   # supp 2 (N1) != N0
    ])
    spark.createDataFrame(
        [(1, 7)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(7, 0)], "c_custkey long, c_nationkey int"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int"
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(0, "N0"), (1, "N1")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/nation.parquet")

    rows = nation_local_supplier_revenue(spark, str(tmp_path)).collect()
    assert [(r.nation_name, r.n_lineitems, r.revenue_e4) for r in rows] == [
        ("N0", 1, 10000 * 90)
    ]


def test_returned_revenue_topk_planted(spark, tmp_path):
    """Only flag-'R' lines count; per-customer sums rank with the
    (revenue desc, custkey asc) total order."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        customers_returned_revenue,
    )

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "R", "O", t),
        (1, 2, 1, 2, 1.0, 50.00, 0.0, 0.0, "N", "O", t),   # kept? no: flag N
        (2, 3, 1, 1, 1.0, 30.00, 0.0, 0.0, "R", "O", t),
    ])
    spark.createDataFrame(
        [(1, 7), (2, 8)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(7, "Alice", 0), (8, "Bob", 0)],
        "c_custkey long, c_name string, c_nationkey int",
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(0, "N0")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/nation.parquet")

    rows = customers_returned_revenue(spark, str(tmp_path)).collect()
    assert [
        (r.c_custkey, r.n_returned_items, r.returned_rev_e4) for r in rows
    ] == [(7, 1, 10000 * 100), (8, 1, 3000 * 100)]


def test_order_distribution_planted(spark, tmp_path):
    """The Q13 capability: a customer with NO qualifying orders must
    survive the outer join as count 0; excluded-priority orders don't
    count."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        customer_order_distribution,
    )

    t = datetime(1997, 6, 1)
    spark.createDataFrame(
        [(7,), (8,), (9,)], "c_custkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [
            (1, 7, "1-URGENT", t),
            (2, 7, "3-MEDIUM", t),
            (3, 8, "5-LOW", t),     # excluded: cust 8 counts as 0
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")

    got = {
        r.c_count: r.custdist
        for r in customer_order_distribution(spark, str(tmp_path)).collect()
    }
    assert got == {2: 1, 0: 2}  # cust 7 has 2; custs 8 and 9 have 0


def test_kept_orders_waiting_planted(spark, tmp_path):
    """The Q21 capability: a supplier scores only on finalized
    multi-supplier orders where it is the ONLY late supplier."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        suppliers_kept_orders_waiting,
    )

    od = datetime(1997, 1, 1)
    late = datetime(1997, 6, 1)     # > 90 days after od
    ok = datetime(1997, 1, 15)
    _write_lineitem(spark, tmp_path, [
        # order 1 (F): supp 1 late, supp 2 on time -> supp 1 scores
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", late),
        (1, 2, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", ok),
        # order 2 (F): both late -> nobody scores (n_late_supp = 2)
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", late),
        (2, 2, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", late),
        # order 3 (F): single-supplier, late -> no other supplier exists
        (3, 1, 3, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", late),
        # order 4 (O, not finalized): would qualify but status filters it
        (4, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
        (4, 2, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
    ])
    spark.createDataFrame(
        [(1, "F", od), (2, "F", od), (3, "F", od), (4, "O", od)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")

    rows = suppliers_kept_orders_waiting(spark, str(tmp_path)).collect()
    assert [(r.s_suppkey, r.numwait) for r in rows] == [(1, 1)]


def test_excess_supply_planted(spark, tmp_path):
    """The Q20 dominance predicate: qty·n_supp > mult·total, on
    name-matched parts only."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        excess_supply_candidates,
    )

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        # part 1 ("small x"): supp 1 has 10 of 12 with 3 suppliers ->
        # 10*3 > 2*12 dominates; supps 2,3 have 1 each (3 <= 24)
        (1, 1, 1, 1, 10.0, 10.0, 0.0, 0.0, "N", "O", t),
        (2, 1, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", t),
        (3, 1, 3, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", t),
        # part 2 (name not matching): supp 2 would dominate, filtered out
        (4, 2, 2, 1, 99.0, 10.0, 0.0, 0.0, "N", "O", t),
    ])
    spark.createDataFrame(
        [(1, "small ring"), (2, "red gear")], "p_partkey long, p_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")

    rows = excess_supply_candidates(spark, str(tmp_path)).collect()
    assert [(r.s_suppkey, r.s_name, r.n_dominated_parts) for r in rows] == [
        (1, "S1", 1)
    ]


def test_value_concentration_planted(spark, tmp_path):
    """The Q11 global-scalar HAVING: only parts above total/den survive,
    and only the scoped nation's suppliers contribute."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        nation_part_value_concentration,
    )

    t = datetime(1997, 6, 1)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 96.0, 0.0, 0.0, "N", "O", t),   # part 1: 9600
        (2, 2, 1, 1, 1.0, 3.0, 0.0, 0.0, "N", "O", t),    # part 2: 300
        (3, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t),    # part 3: 100
        (4, 4, 2, 1, 1.0, 500.0, 0.0, 0.0, "N", "O", t),  # wrong nation
    ])
    spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int"
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")
    spark.createDataFrame(
        [(0, "NATION_X"), (1, "NATION_Y")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/nation.parquet")

    # total = 10000 cents; den 50 -> threshold 200: parts 1 and 2 survive
    rows = nation_part_value_concentration(
        spark, str(tmp_path), nation="NATION_X", fraction_den=50
    ).collect()
    assert {(r.p_partkey, r.value_cents) for r in rows} == {(1, 9600), (2, 300)}


def test_late_shipment_modes_planted(spark, tmp_path):
    """The Q12 CASE-count pair: lateness gates the join; priority
    routes each line to exactly one of the two counters."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        lineitem_late_shipment_modes,
    )

    od = datetime(1997, 1, 1)
    late = datetime(1997, 4, 1)     # > 60 days
    ok = datetime(1997, 1, 15)
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", late),  # urgent, late
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "F", late),  # low, late
        (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),  # medium, late, O
        (1, 2, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "F", ok),    # on time
    ])
    spark.createDataFrame(
        [(1, "1-URGENT", od), (2, "5-LOW", od), (3, "3-MEDIUM", od)],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")

    got = {
        r.l_linestatus: (r.high_line_count, r.low_line_count)
        for r in lineitem_late_shipment_modes(spark, str(tmp_path)).collect()
    }
    assert got == {"F": (1, 1), "O": (0, 1)}


def test_top_supplier_tie_planted(spark, tmp_path):
    """The Q15 scalar-max equality: BOTH tied suppliers surface (no
    arbitrary limit-1), out-of-window revenue ignored."""
    from spotify_tracks_spark.operators.tpch_shapes import top_supplier_revenue

    t_in = datetime(1996, 2, 1)
    t_out = datetime(1996, 6, 1)    # outside the 3-month window
    _write_lineitem(spark, tmp_path, [
        (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", t_in),
        (2, 1, 2, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", t_in),
        (3, 1, 3, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", t_in),
        (4, 1, 3, 1, 1.0, 999.0, 0.0, 0.0, "N", "O", t_out),
    ])
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).coalesce(1).write.parquet(f"{tmp_path}/supplier.parquet")

    rows = top_supplier_revenue(spark, str(tmp_path)).collect()
    assert {(r.s_suppkey, r.total_rev_e4) for r in rows} == {
        (1, 10000 * 100),
        (2, 10000 * 100),
    }
