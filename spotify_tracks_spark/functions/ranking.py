"""Two-level distributed global ranking / prefix sums.

The scale-correct replacement for ``Window.orderBy(...)`` with no
partition spec: a partition-less window moves the WHOLE frame through
one task (Spark itself warns ``WindowExec: No Partition Defined``),
which is fine for tiny value-grain frames but a serialization point for
entity-grain frames (one row per user = billions at 100 TB).

The classic two-level construction used here instead:

1. **Range-partition** the frame on the total order's sort keys
   (``repartitionByRange``), so partition *i* holds a contiguous slice
   of the global order (every key in partition *i* precedes every key
   in partition *i+1*; callers must include a unique tie-breaker so the
   order is total and no key value straddles a boundary).
2. **Freeze** the partitioning with ``localCheckpoint(eager=True)``.
   This is load-bearing, not a cache nicety: range boundaries come from
   per-action sampling, so without materialization the offsets action
   and the final query could see DIFFERENT partition assignments and
   the composed ranks would be silently wrong.
3. **Rank locally** per partition — a ``Window.partitionBy(pid)``, so
   WindowExec runs partitioned and parallel — and collect the bounded
   per-partition totals (``num_partitions`` rows, the documented
   driver-side collect) into an exclusive-prefix **offset map** applied
   as a literal ``map`` lookup: ``global = offset[pid] + local``.

The same offsets generalize from ``row_number`` (prefix sum of 1) to
any exact bigint running sum, which is what ``events_pareto`` needs for
its cumulative share.  ``ntile_from_rank`` derives NTILE buckets from
the global rank with driver-side integer arithmetic (Spark's NTile
contract: the first ``n % k`` buckets get ``n div k + 1`` rows), so the
three quartile scores in ``events_rfm`` need no global window either.

All arithmetic stays exact: ranks/sums are bigints; the one double
division inside ``ntile_from_rank`` divides an exact multiple by its
divisor (the remainder is subtracted first), which IEEE-754 rounds to
the exact integer quotient for any count below 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: Internal partition-id column (dropped before returning).
_PID = "__tlr_pid"

#: Above this partition count the per-pid offsets ride a broadcast
#: DataFrame join instead of literal ``create_map`` expressions: at
#: production settings (thousands of shuffle partitions) one literal
#: map per measure plus the rank bloats the plan / codegen, while a
#: broadcast relation of ``num_partitions`` rows is O(1) in plan size.
_OFFSET_MAP_MAX_PARTITIONS = 256


def _offset_map(pairs: list[tuple[int, int]]) -> Column:
    """Literal ``map<int,bigint>`` of (pid -> exclusive prefix total)."""
    flat: list[Column] = []
    for pid, offset in pairs:
        flat.append(F.lit(pid))
        flat.append(F.lit(offset).cast("long"))
    return F.create_map(*flat)


def two_level_prefix(
    df: DataFrame,
    order_cols: list[Column],
    measures: dict[str, Column] | None = None,
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Global row_number (+ optional inclusive running sums) without a
    partition-less window.

    ``order_cols`` must define a TOTAL order (include a unique
    tie-breaker column).  ``measures`` maps output-column names to
    exact-summable (integral) columns; each comes back as the inclusive
    running sum of that column under the global order.

    Returns ``(ranked_df, totals)`` where ``ranked_df`` carries the
    input columns plus ``rank_col`` (bigint, 1-based) and one bigint
    column per measure, and ``totals`` holds the driver-side grand
    totals (``totals[rank_col]`` is the row count) for deriving
    buckets/shares without another pass.

    Cost shape: one range exchange + one pid hash exchange of the
    (already entity-grain) frame, one ``num_partitions``-row collect.
    No stage ever holds more than one partition's rows in one task.
    """
    measures = dict(measures or {})
    if num_partitions is None:
        raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        try:
            num_partitions = int(raw)
        except (TypeError, ValueError):  # e.g. "auto" under some resellers
            num_partitions = 200

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)  # freeze sampled range boundaries
    )

    # Bounded collect: exactly num_partitions rows of exact bigint sums.
    per_part = (
        ranged.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(c).alias(f"__m{i}") for i, c in enumerate(measures.values())],
        )
        .collect()
    )
    per_part.sort(key=lambda r: r[_PID])

    totals: dict[str, int] = {rank_col: 0, **{name: 0 for name in measures}}
    offset_pairs: dict[str, list[tuple[int, int]]] = {
        name: [] for name in [rank_col, *measures]
    }
    for row in per_part:
        offset_pairs[rank_col].append((row[_PID], totals[rank_col]))
        totals[rank_col] += row["__n"]
        for i, name in enumerate(measures):
            offset_pairs[name].append((row[_PID], totals[name]))
            totals[name] += row[f"__m{i}"] or 0

    w = Window.partitionBy(_PID).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)

    if num_partitions <= _OFFSET_MAP_MAX_PARTITIONS:
        # Small partition count: literal map lookup, zero extra joins.
        def _off(name: str) -> Column:
            return F.coalesce(
                F.try_element_at(_offset_map(offset_pairs[name]), F.col(_PID)),
                F.lit(0),
            )

        out = ranged
    else:
        # Production partition counts: offsets ride one broadcast
        # relation keyed on pid (plan size O(1) in num_partitions).
        names = [rank_col, *measures]
        off_cols = [f"__off_{i}" for i in range(len(names))]
        by_pid = {pid: [off] for pid, off in offset_pairs[rank_col]}
        for name in measures:
            for pid, off in offset_pairs[name]:
                by_pid[pid].append(off)
        offsets_df = df.sparkSession.createDataFrame(
            [(pid, *offs) for pid, offs in by_pid.items()],
            schema=f"{_PID} int, " + ", ".join(f"{c} long" for c in off_cols),
        )
        ranged = ranged.join(F.broadcast(offsets_df), _PID, "left")

        def _off(name: str, _idx={n: i for i, n in enumerate(names)}) -> Column:
            return F.coalesce(F.col(off_cols[_idx[name]]), F.lit(0))

        out = ranged

    out = out.withColumn(
        rank_col, (_off(rank_col) + F.row_number().over(w)).cast("long")
    )
    for name, col in measures.items():
        out = out.withColumn(name, _off(name) + F.sum(col).over(run))
    # drop exactly the generated helper columns — never pattern-match on
    # the prefix over out.columns, which would silently swallow a caller
    # column that happens to be named "__off_*"
    drop = [_PID] if num_partitions <= _OFFSET_MAP_MAX_PARTITIONS else [
        _PID, *off_cols
    ]
    return out.drop(*drop), totals


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """NTILE(k) bucket from a 1-based global rank over ``n`` rows,
    reproducing Spark's ``F.ntile`` exactly: with ``q, rem = divmod(n,
    k)``, the first ``rem`` buckets hold ``q + 1`` rows, the rest ``q``.

    Driver-side constants keep this ANSI-safe (no runtime division by
    zero is ever planned) and integer-exact: ``x - x % d`` is an exact
    multiple of ``d``, so the IEEE division returns the exact quotient.
    """
    if n <= 0:
        return F.lit(None).cast("int")
    q, rem = divmod(n, k)
    if q == 0:  # fewer rows than buckets: bucket i holds row i
        return rank.cast("int")
    lo = (rank - F.lit(1)).cast("long")
    big = ((lo - lo % F.lit(q + 1)) / F.lit(q + 1)).cast("long") + 1
    lo2 = lo - F.lit(rem * (q + 1))
    small = F.lit(rem) + ((lo2 - lo2 % F.lit(q)) / F.lit(q)).cast("long") + 1
    return (
        F.when(lo < F.lit(rem * (q + 1)), big).otherwise(small).cast("int")
    )
