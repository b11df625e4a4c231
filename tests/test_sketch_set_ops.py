"""Planted-fixture ground truth for the round-8 sketch set operations.

The DuckDB oracles mirror the same algorithms, so parity alone could
hide a shared systematic bug (the triangle-counting lesson); these
fixtures carry independently-known answers: with every type holding
fewer than k distinct users, the KMV sketches are exact sets and the
theta estimates must equal the true overlap EXACTLY; disjoint types
must clamp the HLL inclusion-exclusion at zero.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _events_dir(spark, tmp_path, rows) -> str:
    root = str(tmp_path)
    spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string",
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("event_id")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).write.mode("overwrite").parquet(f"{root}/events.parquet")
    return root


def test_kmv_set_ops_exact_below_k(spark, tmp_path):
    """Users 1-6 click, users 4-9 view: |A|=6, |B|=6, |A∩B|=3, |A∪B|=9.
    Both types hold < k distinct hashes, so theta = the full space and
    every estimate must be EXACT (the no-branch exact-regime property
    the operator docstring claims)."""
    from spotify_tracks_spark.operators.events import events_kmv_set_ops

    rows = [(u, "click") for u in range(1, 7)] + [
        (u, "view") for u in range(4, 10)
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {(r.type_a, r.type_b): r for r in events_kmv_set_ops(spark, d).collect()}
    r = out[("click", "view")]
    assert r.n_inter_sample == 3 and r.n_union_sample == 9
    assert r.est_intersection == 3.0 and r.est_union == 9.0
    assert abs(r.est_jaccard - 3 / 9) < 1e-12
    assert r.exact_intersection == 3


def test_kmv_set_ops_disjoint_pair_is_zero(spark, tmp_path):
    from spotify_tracks_spark.operators.events import events_kmv_set_ops

    rows = [(u, "click") for u in range(1, 5)] + [
        (u, "view") for u in range(100, 104)
    ]
    d = _events_dir(spark, tmp_path, rows)
    r = events_kmv_set_ops(spark, d).collect()[0]
    assert r.n_inter_sample == 0 and r.est_intersection == 0.0
    assert r.exact_intersection == 0
    assert r.est_union == 8.0  # exact below k


def test_hll_set_ops_disjoint_clamps_and_overlap_tracks_truth(spark, tmp_path):
    """Disjoint types: the raw inclusion-exclusion is pure sketch noise
    around zero — est_intersection must be non-negative (the clamp) and
    inside the union-scale error envelope.  Heavy overlap: the estimate
    must land within the envelope of truth (256 registers ≈ 6.5% rse;
    a generous 5σ band so the test pins semantics, not luck)."""
    from spotify_tracks_spark.operators.events import events_hll_set_ops

    rows = [(u, "click") for u in range(1, 401)] + [
        (u, "view") for u in range(10_001, 10_401)
    ]
    d = _events_dir(spark, tmp_path, rows)
    r = events_hll_set_ops(spark, d).collect()[0]
    assert 0.0 <= r.est_intersection <= 0.325 * 800
    assert r.exact_intersection == 0

    rows2 = [(u, "click") for u in range(1, 401)] + [
        (u, "view") for u in range(201, 601)
    ]
    d2 = _events_dir(spark, tmp_path / "b", rows2)
    r2 = {(x.type_a, x.type_b): x for x in events_hll_set_ops(spark, d2).collect()}[
        ("click", "view")
    ]
    assert r2.exact_intersection == 200
    # union truth 600; intersection truth 200.  5 sigma at 6.5% rse of
    # the union scale ~ 0.325 * 600 — intersection inherits both
    # sketches' noise, so bound it by the union-scale envelope.
    assert abs(r2.est_union - 600) < 0.325 * 600
    assert abs(r2.est_intersection - 200) < 0.325 * 600

def test_set_ops_registers_only_drops_rider_and_second_scan(spark, tmp_path):
    """include_exact=False (the 100 TB deployment shape, round-8 advice):
    the exact_intersection column disappears, every estimate column is
    bit-identical to the default build, the plan stays lint-clean, and
    the events table is scanned ONCE (the rider's distinct+self-join is
    the only second scan in the default plan's tail)."""
    from spotify_tracks_spark.operators.events import (
        events_hll_set_ops,
        events_kmv_set_ops,
    )
    from spotify_tracks_spark.plans.lint import lint_plan

    rows = [(u, "click") for u in range(1, 7)] + [
        (u, "view") for u in range(4, 10)
    ]
    d = _events_dir(spark, tmp_path, rows)
    for op in (events_kmv_set_ops, events_hll_set_ops):
        full = op(spark, d)
        lean = op(spark, d, include_exact=False)
        assert "exact_intersection" in full.columns
        assert "exact_intersection" not in lean.columns
        assert lean.columns == full.columns[:-1]
        key = ["type_a", "type_b"]
        est = [c for c in lean.columns if c not in key]
        assert sorted(full.select(*key, *est).collect()) == sorted(
            lean.collect()
        )
        assert lint_plan(lean) == []


def test_stream_kmv_set_ops_registers_only(spark):
    """The streaming fold's include_exact=False report equals the batch
    registers-only report (the drained registers are lossless), with no
    exact_intersection column — the truly never-re-reads-history shape
    the docstring now scopes the claim to."""
    from .conftest import SF_SMOKE as sf_dir

    from spotify_tracks_spark.operators.events import events_kmv_set_ops
    from spotify_tracks_spark.streaming.sketch import stream_events_kmv_set_ops

    lean_stream = stream_events_kmv_set_ops(spark, sf_dir, include_exact=False)
    assert "exact_intersection" not in lean_stream.columns
    lean_batch = events_kmv_set_ops(spark, sf_dir, include_exact=False)
    assert sorted(lean_stream.collect()) == sorted(lean_batch.collect())


def test_kmv_anotb_exact_below_k(spark, tmp_path):
    """Users 1-6 click, users 4-9 view: |A\\B| = |{1,2,3}| = 3 and
    |B\\A| = |{7,8,9}| = 3.  Below k both thetas are the full space, so
    the directional estimates must be EXACT; the exact riders must
    agree; and the set algebra must close: est_a_not_b + est_b_not_a +
    est_intersection = est_union."""
    from spotify_tracks_spark.operators.events import (
        events_kmv_anotb,
        events_kmv_set_ops,
    )

    rows = [(u, "click") for u in range(1, 7)] + [
        (u, "view") for u in range(4, 10)
    ]
    d = _events_dir(spark, tmp_path, rows)
    r = {(x.type_a, x.type_b): x for x in events_kmv_anotb(spark, d).collect()}[
        ("click", "view")
    ]
    assert r.n_a_not_b == 3 and r.n_b_not_a == 3
    assert r.est_a_not_b == 3.0 and r.est_b_not_a == 3.0
    assert r.exact_a_not_b == 3 and r.exact_b_not_a == 3
    s = {(x.type_a, x.type_b): x for x in events_kmv_set_ops(spark, d).collect()}[
        ("click", "view")
    ]
    assert r.est_a_not_b + r.est_b_not_a + s.est_intersection == s.est_union


def test_kmv_anotb_disjoint_and_registers_only(spark, tmp_path):
    """Disjoint types: each direction equals its own cardinality.  The
    include_exact=False path drops both exact riders and keeps the
    estimate columns bit-identical."""
    from spotify_tracks_spark.operators.events import events_kmv_anotb

    rows = [(u, "click") for u in range(1, 5)] + [
        (u, "view") for u in range(100, 104)
    ]
    d = _events_dir(spark, tmp_path, rows)
    full = events_kmv_anotb(spark, d)
    r = full.collect()[0]
    assert r.est_a_not_b == 4.0 and r.est_b_not_a == 4.0
    assert r.exact_a_not_b == 4 and r.exact_b_not_a == 4
    lean = events_kmv_anotb(spark, d, include_exact=False)
    assert lean.columns == full.columns[:-2]
    key = ["type_a", "type_b"]
    est = [c for c in lean.columns if c not in key]
    assert sorted(full.select(*key, *est).collect()) == sorted(lean.collect())


def test_stream_kmv_anotb_equals_batch(spark):
    """The streaming fold's drained registers produce the identical
    directional-difference report as the batch build (lossless
    union-and-retake merge — same contract as the set-ops fold)."""
    from .conftest import SF_SMOKE as sf_dir

    from spotify_tracks_spark.operators.events import events_kmv_anotb
    from spotify_tracks_spark.streaming.sketch import stream_events_kmv_anotb

    batch = events_kmv_anotb(spark, sf_dir)
    stream = stream_events_kmv_anotb(spark, sf_dir)
    assert sorted(batch.collect()) == sorted(stream.collect())


def test_stream_hll_set_ops_equals_batch(spark):
    """The streaming HLL fold's drained registers (register-wise max —
    lossless, idempotent) produce the identical pair union/
    inclusion-exclusion report as the batch build, and the
    registers-only variant drops the exact rider."""
    from .conftest import SF_SMOKE as sf_dir

    from spotify_tracks_spark.operators.events import events_hll_set_ops
    from spotify_tracks_spark.streaming.sketch import stream_events_hll_set_ops

    batch = events_hll_set_ops(spark, sf_dir)
    stream = stream_events_hll_set_ops(spark, sf_dir)
    assert sorted(batch.collect()) == sorted(stream.collect())
    lean = stream_events_hll_set_ops(spark, sf_dir, include_exact=False)
    assert "exact_intersection" not in lean.columns
