"""Whole-surface physical-plan lint (the scale anti-pattern gate).

Walks the pre-AQE physical plan of EVERY registered query — the 50
driver-checked entries plus the pytest-only extras — and fails on the
three 100-TB killers (``spotify_tracks_spark/plans/lint.py``):
partition-less WindowExec over an unbounded frame, CartesianProduct,
and a broadcast join building an unreduced fact-table scan.

This turns the per-round manual ``.explain`` audit into a regression
gate: a new operator (or a Spark upgrade that stops rewriting a global
top-k window into WindowGroupLimit / TakeOrderedAndProject) fails CI
instead of silently serializing a frame.  Every exemption is an
explicit per-query allow-list entry with the tiny-grain justification
next to it.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from spotify_tracks_spark.plans.lint import lint_plan

from .conftest import SF_SMOKE

ALL_QUERIES = {**entrymod.queries(), **entrymod.extra_queries()}

#: Queries whose partition-less window runs over a provably tiny frame
#: (bounded by a DISTINCT grain, not by the fact/entity row count).
ALLOW_GLOBAL_WINDOW = {
    # |distinct event-time| grain survival tables
    "events_kaplan_meier",
    "events_log_rank",
    # |distinct per-user count values| grain cumulative tables
    "events_ks_test",
    "events_mann_whitney",
    # fixed handful of pipeline gates / funnel stages
    "corpus_survival",
    # |distinct event-days| grain cumulative-conversion monitor
    # (batch + the streaming fold's shared report tail)
    "events_sequential_ab",
    "events_stream_sequential_ab",
}

#: Queries allowed a CartesianProduct (none: one-row spines plan as
#: BroadcastNestedLoopJoin, which rule 3 vets separately).
ALLOW_CARTESIAN: set[str] = set()

#: Queries allowed to build a broadcast from a fact-table subtree
#: (each is a bounded derivation the linter's reducing-node walk
#: cannot see through).
ALLOW_FACT_BROADCAST: set[str] = {
    # The ANN/embedding family explicitly broadcasts its PROBE SET —
    # semantically an external query batch, stood in for by the
    # `vec_id % probe_mod == 0` corpus slice (1/100th) because the
    # fixture has no separate query table.  A deployed search ships a
    # fixed-size probe batch; the filter is what the linter cannot
    # prove bounded.  (Model matrices — centroids/codebooks — ride
    # one-row aggregated spines and pass rule 3 on their own.)
    "ann_recall_eval",
    "ann_recall_eval_all",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_ivf_nprobe",
    "ann_topk_ivfpq",
    "ann_topk_lsh",
    "ann_topk_pq",
    # composes ann_topk_ivf + ann_topk_lsh: inherits exactly their
    # adjudicated probe-set broadcasts, adds no scan of its own
    "ann_topk_rrf_fusion",
    "dedup_embedding",
    "embedding_knn_classifier",
    "embedding_negative_samples",
    "embedding_truncation_recall",
    # med/mad are |event_type|-grain by construction: a per-type median
    # window + `rn == (n+1)/2` filter leaves exactly one row per type,
    # a reduction expressed as window+filter rather than Aggregate.
    "events_mad_outliers",
}

#: Queries allowed a BroadcastNestedLoopJoin whose build side the
#: bounded-walk cannot prove (rule 5).  Three shapes, each adjudicated:
ALLOW_UNBOUNDED_BNLJ: set[str] = {
    # (a) The ANN/embedding probe-set broadcasts — the identical
    # adjudication as their rule-3 entries above: the build side is the
    # `vec_id % probe_mod == 0` corpus slice standing in for an external
    # fixed-size query batch, which a filter node cannot prove bounded.
    "ann_recall_eval",
    "ann_recall_eval_all",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_ivf_nprobe",
    "ann_topk_ivfpq",
    "ann_topk_pq",
    "ann_topk_rrf_fusion",  # composes ivf+lsh (same adjudication)
    "dedup_embedding",
    "embedding_knn_classifier",
    "embedding_negative_samples",
    "embedding_truncation_recall",
    "embedding_pq",
    # (b) localCheckpointed one-row model spines (centroid matrices):
    # the checkpoint truncates lineage to an opaque RDDScanExec, hiding
    # the grouping-free aggregate that proves the single row.
    "embedding_kmeans",
    "embedding_kmeans_init_counts",
    # (c) tiny-grain grouped-aggregate spines crossed back onto their
    # own aggregate output: |distinct days| (autocorrelation, cusum,
    # spearman, type_correlation), |weeks| (weekly_drift), |splits x
    # bands| (split_drift), |retention offsets| (curve_fit) — grains
    # bounded by the calendar / enum, not by the fact row count.
    "events_autocorrelation",
    "events_cusum_changepoint",
    "events_spearman_corr",
    "events_type_correlation",
    "events_weekly_drift",
    "corpus_split_drift",
    "events_retention_curve_fit",
}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_plan_has_no_scale_antipatterns(spark, name):
    df = ALL_QUERIES[name](spark, SF_SMOKE)
    violations = lint_plan(
        df,
        allow_global_window=name in ALLOW_GLOBAL_WINDOW,
        allow_cartesian=name in ALLOW_CARTESIAN,
        allow_fact_broadcast=name in ALLOW_FACT_BROADCAST,
        allow_unbounded_bnlj=name in ALLOW_UNBOUNDED_BNLJ,
    )
    assert not violations, f"{name}: {violations}"


def test_topk_global_windows_keep_their_bounding_rewrite(spark):
    """The global top-k operators are scale-safe ONLY because Spark
    rewrites ``row_number over (order by ...)`` + ``rank <= k`` into a
    pre-limiting node (WindowGroupLimit / TakeOrderedAndProject) below
    the single-partition merge.  Pin that rewrite explicitly for the
    three operators that lean on it, so a Spark version/config change
    that stops inferring it fails HERE instead of silently serializing
    an entity-grain frame (the optimization is config-gated:
    spark.sql.optimizer.insertWindowGroupLimit / rank-limit pushdown)."""
    from spotify_tracks_spark.operators.analytics import events_key_skew
    from spotify_tracks_spark.operators.events import events_session_paths
    from spotify_tracks_spark.operators.llm_prep import corpus_vocab_encode
    from spotify_tracks_spark.plans.lint import _BOUNDING, _name, _walk

    for fn in (events_key_skew, events_session_paths, corpus_vocab_encode):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().sparkPlan()
        globals_seen = 0
        for node in _walk(plan):
            if _name(node) == "WindowExec" and node.partitionSpec().isEmpty():
                globals_seen += 1
                bounded = any(
                    _name(n) in _BOUNDING for n in _walk(node.child())
                )
                assert bounded, (
                    f"{fn.__name__}: global window lost its bounding "
                    "rewrite (WindowGroupLimit / TakeOrderedAndProject)"
                )
        assert globals_seen > 0, (
            f"{fn.__name__}: expected a (bounded) global top-k window in "
            "the plan — operator shape changed, update this pin"
        )


def test_lint_catches_planted_violations(spark):
    """The gate must actually fire: plant each anti-pattern and assert
    the linter reports it (guards against a silently-vacuous lint)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")

    planted_window = ev.withColumn(
        "r", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    assert any("WindowExec" in v for v in lint_plan(planted_window))

    planted_cartesian = ev.hint("shuffle_replicate_nl").crossJoin(
        ev.select(F.col("event_id").alias("e2"))
    )
    assert any("Cartesian" in v for v in lint_plan(planted_cartesian))

    planted_broadcast = ev.join(
        F.broadcast(
            spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("event_id")
        ),
        "event_id",
    )
    assert any("fact-table" in v for v in lint_plan(planted_broadcast))

    # rule 4: a plain F.udf plans as BatchEvalPythonExec (row-at-a-time)
    plain_udf = F.udf(lambda v: v + 1.0, "double")
    planted_udf = ev.select(plain_udf(F.col("value")).alias("v2"))
    assert any("BatchEvalPython" in v for v in lint_plan(planted_udf))

    # rule 1 false-negative fix (round-6 advice): a limit on the SMALL
    # SIDE of a join must NOT mark a global window over the merged frame
    # as bounded — the limit bounds one branch, not the join output.
    small = ev.select("user_id").distinct().limit(5)
    merged = ev.join(small, "user_id")
    planted_joined_window = merged.withColumn(
        "r", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    assert any("WindowExec" in v for v in lint_plan(planted_joined_window))

    # and the benign shapes stay clean: a bounded global top-k window
    # (TakeOrderedAndProject below it) and a dimension broadcast
    topk = ev.orderBy(F.desc("value")).limit(5).withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("value")))
    )
    assert lint_plan(topk) == []
    dim = ev.join(
        F.broadcast(spark.read.parquet(f"{SF_SMOKE}/nation.parquet")),
        ev.user_id == F.col("n_nationkey"),
    )
    assert lint_plan(dim) == []

    # the sanctioned Arrow-batched Python paths stay clean under rule 4
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _plus_one(s):
        return s + 1.0

    arrow_udf = ev.select(_plus_one(F.col("value")).alias("v2"))
    assert lint_plan(arrow_udf) == []

    # rule 5: an UNHINTED crossJoin against a filtered (unproven) side
    # plans as BroadcastNestedLoopJoin without tripping rule 2 — flag it
    planted_bnlj = ev.crossJoin(
        ev.select(F.col("value").alias("v2")).filter(F.col("v2") > 1e18)
    )
    assert any(
        "BroadcastNestedLoopJoin" in v for v in lint_plan(planted_bnlj)
    )
    # ...and the sanctioned one-row spines stay clean: a grouping-free
    # aggregate build side is provably a single row
    spine = ev.agg(F.max("value").alias("vmax"))
    assert lint_plan(ev.crossJoin(F.broadcast(spine))) == []
