"""Data-profiling operator — the `dbt test`-adjacent surface generalized:
per-column row/null/distinct counts plus numeric ranges in ONE pass.

The reference's declared checks are per-column ``unique``/``not_null``
assertions (SURVEY.md §2.11; executed by checks.py).  A warehouse team
also wants the *profile* those checks are judged against — ``profile``
computes it for any table as a single aggregate, not one scan per column
(a naive profiler scans N× for N columns; this scans once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.time_utils import epoch_micros
from ..sources.tables import read_table

# (column, kind) — kind drives the numeric-range slot: "num" profiles
# min/max as double, "ts" via exact epoch-micros, "str"/"other" leaves
# them NULL
PROFILE_COLS = (
    ("event_id", "num"),
    ("ts", "ts"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
)

DOCS_PROFILE_COLS = (
    ("doc_id", "num"),
    ("lang", "str"),
    ("source", "str"),
    ("n_chars", "num"),
)


def profile(df: DataFrame, cols: tuple[tuple[str, str], ...]) -> DataFrame:
    """One-scan column profile of ``df`` over ``cols`` ((name, kind)).

    All metrics ride a single ``agg``: Catalyst compiles the N
    ``countDistinct`` into one Expand + two-phase hash aggregate, so the
    table is read and shuffled once regardless of column count — at
    100 TB that Expand (N× row multiplication, map-side partial-agg'd)
    is the standard multi-distinct plan and beats N separate scans by
    the width of the table.  Timestamp ranges go through exact integer
    ``epoch_micros`` first, then one double cast (epoch micros ≈ 1.7e15
    < 2^53, so the cast is exact — and identical in both engines).

    Output: one row per column — (column_name, n_rows, n_nulls,
    n_distinct, min_num, max_num); min/max NULL for string columns."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if kind == "num":
            src = F.col(c).cast("double")
        elif kind == "ts":
            src = epoch_micros(F.col(c)).cast("double")
        else:
            src = F.lit(None).cast("double")
        aggs.append(F.min(src).alias(f"min_{c}"))
        aggs.append(F.max(src).alias(f"max_{c}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"min_{c}").alias("min_num"),
            F.col(f"max_{c}").alias("max_num"),
        )
        for c, _ in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of ``events`` (see ``profile``)."""
    return profile(read_table(spark, sf_dir, "events"), PROFILE_COLS)


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of ``documents`` — same generalized
    operator as ``events_profile``, proving the profiler is
    table-agnostic (the ``text`` payload column is deliberately excluded:
    a countDistinct over full document bodies shuffles the corpus by
    text, which a profiler must not do; text-shape metrics live in
    text_analysis.py's scan-speed operators instead)."""
    return profile(read_table(spark, sf_dir, "documents"), DOCS_PROFILE_COLS)
