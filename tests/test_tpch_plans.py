"""Physical-plan assertions for the warehouse shapes: the scale claims
(pushdown, broadcast, join strategy) verified on the EXECUTED plan, not
just documented.  Uses the formatted explain string at t2 scale."""

from __future__ import annotations

from tests.conftest import SF_T2


def _plan(df) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q6_range_filters_reach_the_scan(spark):
    """The pure-scan forecast's capability IS pushdown: both shipdate
    bounds must appear in the lineitem scan's PushedFilters."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        lineitem_revenue_forecast,
    )

    plan = _plan(lineitem_revenue_forecast(spark, SF_T2))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_q19_disjunction_pushes_as_one_predicate(spark):
    """Q19's capability: the OR-of-conjunctions reaches the part scan
    as ONE pushed predicate (not three scans, not a post-join filter)."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        disjunctive_branch_revenue,
    )

    import re

    plan = _plan(disjunctive_branch_revenue(spark, SF_T2))
    pushed = [
        m for m in re.findall(r"PushedFilters: \[[^\]]*\]", plan) if "Or(" in m
    ]
    # exactly one scan carries the whole Or tree over p_brand
    assert len(pushed) == 1 and "p_brand" in pushed[0], plan[:2000]


def test_q7_nation_pair_prunes_before_broadcast(spark):
    """The two-nation IN filter must be pushed to the nation scan and
    the pruned dims must broadcast (no fact-side shuffle for dims)."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        nation_volume_shipping,
    )

    plan = _plan(nation_volume_shipping(spark, SF_T2))
    assert "In(n_name" in plan
    assert "BroadcastHashJoin" in plan


def test_q13_outer_join_survives(spark):
    """Q13's capability: the left OUTER join (zero-order customers must
    survive) is planned as an outer join, not silently inner-ed."""
    from spotify_tracks_spark.operators.tpch_shapes import (
        customer_order_distribution,
    )

    plan = _plan(customer_order_distribution(spark, SF_T2))
    assert "LeftOuter" in plan
