"""Direct contract tests for the two-level distributed ranking
primitive (``functions/ranking.py``) — the replacement for every
partition-less global window over an entity-grain frame.

The operator-level oracles (gini / rfm / pareto / pack_sequences)
already hash-check end results; these tests pin the primitive ITSELF
against the single-partition formulation it replaces, across partition
counts (including more partitions than rows), plus the NTILE bucket
formula against Spark's own ``F.ntile`` for awkward (n, k) shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spotify_tracks_spark.functions.ranking import ntile_from_rank, two_level_prefix

from .conftest import SF_SMOKE


def _per_user(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("x"), F.sum("value").alias("v"))
    )


@pytest.mark.parametrize("nparts", [1, 3, 32, 1000])
def test_two_level_rank_and_prefix_match_global_window(spark, nparts):
    """Rank and running sum equal the single-partition window's, for
    partition counts below, at, and far above the row count (empty
    range partitions must not corrupt offsets)."""
    df = _per_user(spark)
    got, totals = two_level_prefix(
        df,
        [F.desc("x"), F.asc("user_id")],
        measures={"cum": F.col("x")},
        rank_col="rk",
        num_partitions=nparts,
    )
    w = Window.orderBy(F.desc("x"), F.asc("user_id"))
    want = df.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "cum", F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got_rows = {r.user_id: (r.rk, r.cum) for r in got.collect()}
    want_rows = {r.user_id: (r.rk, r.cum) for r in want.collect()}
    assert got_rows == want_rows
    assert totals["rk"] == len(want_rows)
    assert totals["cum"] == df.agg(F.sum("x")).collect()[0][0]


def test_two_level_plan_has_no_partitionless_window(spark):
    """The primitive's own plan must pass the lint rule it exists to
    satisfy: every WindowExec is partitioned (by the frozen pid)."""
    from spotify_tracks_spark.plans.lint import lint_plan

    got, _ = two_level_prefix(
        _per_user(spark), [F.asc("x"), F.asc("user_id")], rank_col="rk"
    )
    assert lint_plan(got) == []


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (7, 3), (150, 4), (151, 4), (153, 4)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    """The driver-side bucket formula reproduces Spark's NTILE exactly,
    including the first-buckets-get-the-extra-row remainder rule and
    the n < k degenerate case."""
    df = spark.range(n).select(F.col("id").alias("u"))
    w = Window.orderBy("u")
    want = df.select("u", F.ntile(k).over(w).alias("b"))
    got = df.select(
        "u",
        ntile_from_rank(F.row_number().over(w), n, k).alias("b"),
    )
    assert {(r.u, r.b) for r in got.collect()} == {
        (r.u, r.b) for r in want.collect()
    }
    assert dict(got.dtypes)["b"] == "int"


@pytest.mark.parametrize("nparts", [None, 1000])
def test_two_level_prefix_empty_frame(spark, nparts):
    """Empty input: no rows, zero totals, schema intact (no div-by-zero
    or missing-key map errors under ANSI mode) — on both the literal-map
    path (default nparts) and the broadcast-offsets path (1000)."""
    df = _per_user(spark).filter(F.lit(False))
    got, totals = two_level_prefix(
        df,
        [F.asc("x"), F.asc("user_id")],
        measures={"cum": F.col("x")},
        rank_col="rk",
        num_partitions=nparts,
    )
    assert got.count() == 0
    assert totals == {"rk": 0, "cum": 0}
    assert {"rk", "cum"} <= set(got.columns)


def test_two_level_prefix_broadcast_path_plan_is_small(spark):
    """Above _OFFSET_MAP_MAX_PARTITIONS the offsets must ride a
    broadcast relation, not per-partition literal maps: the plan string
    must not grow with the partition count (the round-6 advice item —
    thousands of shuffle partitions would bloat codegen otherwise)."""
    df = _per_user(spark)
    got, _ = two_level_prefix(
        df,
        [F.asc("x"), F.asc("user_id")],
        measures={"cum": F.col("x")},
        rank_col="rk",
        num_partitions=1000,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # No create_map literal of pid offsets in the optimized plan.
    assert "map(0," not in got._jdf.queryExecution().optimizedPlan().toString()
