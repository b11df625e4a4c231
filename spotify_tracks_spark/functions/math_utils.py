"""Arithmetic helpers mirroring the reference's Jinja macros."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def safe_divide(numerator: Column, denominator: Column) -> Column:
    """``dbt_utils.safe_divide(n, d)`` ⇒ ``(n) / nullif((d), 0)``.

    NULL on zero denominator (rpt_discovery_rate.sql:51-56). Division of two
    integral columns yields DoubleType in Spark, matching DuckDB's ``/``.
    """
    return numerator / F.nullif(denominator, F.lit(0))
