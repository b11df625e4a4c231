"""Conflict-ignoring append — the reference's ``INSERT ... ON CONFLICT DO
NOTHING`` (flows/pull_recent_tracks.py:208-231) as a Spark operator.

Spark has no built-in conflict-ignoring append (SURVEY.md §2.2), so:
``append_if_absent`` = incoming ⟕anti existing on the key columns, then
(caller) appends the survivors.  Within-batch duplicates are collapsed
first (deterministic winner = min over the remaining columns), mirroring
the first-writer-wins of sequential INSERTs.

Scale: the anti-join shuffles on the key; with the sink table bucketed by
the same key the exchange on the existing side disappears.  On Delta-capable
clusters the equivalent is ``MERGE WHEN NOT MATCHED THEN INSERT`` — this
operator is the storage-agnostic fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def collapse_batch(incoming: DataFrame, key_cols: list[str]) -> DataFrame:
    """One row per key within the batch; deterministic winner (min of the
    non-key columns, lexicographically)."""
    other = [c for c in incoming.columns if c not in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.coalesce(F.col(c).cast("string"), F.lit("~")) for c in other]
    )
    return (
        incoming.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def append_if_absent(existing: DataFrame, incoming: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose key is not already in ``existing``
    (collapsed within-batch first).  Caller unions/appends the result."""
    deduped = collapse_batch(incoming, key_cols)
    return deduped.join(existing.select(*key_cols).distinct(), key_cols, "left_anti")


def idempotent_union(existing: DataFrame, incoming: DataFrame, key_cols: list[str]) -> DataFrame:
    """The post-append table: existing ∪ (incoming \\ existing-keys)."""
    return existing.unionByName(append_if_absent(existing, incoming, key_cols))
