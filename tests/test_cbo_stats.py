"""Cost-based-optimizer statistics: ANALYZE TABLE feeds the catalog,
the catalog feeds plan estimates, and estimates drive join strategy —
the knob that matters when dims are no longer trivially tiny at scale
(statistics-informed planning is how a 100 TB warehouse avoids
mis-sided joins; on parquet-path reads Spark only has file sizes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_T2


@pytest.fixture()
def analyzed_tables(spark):
    from spotify_tracks_spark.sources.tables import read_table

    read_table(spark, SF_T2, "customer").write.mode("overwrite").saveAsTable(
        "cbo_customer"
    )
    read_table(spark, SF_T2, "orders").write.mode("overwrite").saveAsTable(
        "cbo_orders"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS cbo_customer")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")


def _row_count_estimate(df):
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if not rc.isDefined():
        return None
    v = rc.get()  # py4j may hand back a BigInt object or a plain int
    return int(v.longValue()) if hasattr(v, "longValue") else int(v)


def test_analyze_feeds_rowcount_estimates(spark, analyzed_tables):
    """COMPUTE STATISTICS lands the exact row count in the catalog, and
    with CBO on the optimized plan carries it as its cardinality
    estimate — before ANALYZE there is no row count at all."""
    n_cust = spark.table("cbo_customer").count()
    prior = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        assert _row_count_estimate(spark.table("cbo_customer")) is None

        spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
        assert _row_count_estimate(spark.table("cbo_customer")) == n_cust
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prior)


def test_column_stats_shrink_filter_estimates(spark, analyzed_tables):
    """FOR ALL COLUMNS histograms make a selective equality filter's
    cardinality estimate collapse toward the true selectivity instead
    of the no-stats row count — the input every join-side decision
    reads."""
    prior = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.statistics.histogram.enabled")
    }
    try:
        spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
        spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.conf.set("spark.sql.cbo.enabled", "true")

        full = spark.table("cbo_customer")
        seg = full.filter(F.col("c_mktsegment") == "BUILDING")
        n_all = full.count()
        est = _row_count_estimate(seg)
        true_n = seg.count()
        assert est is not None and est < n_all
        # estimate within 3x of truth (5 segments -> ~20% selectivity)
        assert true_n / 3 <= est <= true_n * 3, (est, true_n)
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
