"""Physical-plan linter: the scale anti-pattern gate.

Every round's manual ``.explain`` audit looked for the same three
100-TB killers; this module turns that audit into a programmatic check
that tests can run over the WHOLE registered query surface:

1. **Partition-less WindowExec** — ``Window.orderBy(...)`` with no
   ``partitionBy`` funnels the entire frame through ONE task (Spark
   warns ``No Partition Defined for Window operation``).  Benign only
   when (a) the frame is provably tiny (value-grain / distinct-days
   grain — the caller allow-lists those queries), or (b) a bounding
   node sits BELOW the window — Spark's rank-limit pushdown
   (``WindowGroupLimitExec``), a ``TakeOrderedAndProject``, or a global
   limit — so each upstream partition pre-prunes before the single
   merge (the global top-k shape).
2. **CartesianProductExec** — an unkeyed join that materializes |L|·|R|
   pairs across every executor pair.  Benign only as a one-row spine
   (scalar broadcast), which Spark plans as BroadcastNestedLoopJoin,
   not CartesianProduct — so any CartesianProduct at all is flagged
   unless explicitly allow-listed.
4. **Row-at-a-time Python UDF** — a ``BatchEvalPythonExec`` node means
   a plain ``F.udf`` runs one pickled Python call PER ROW (no Arrow,
   no vectorization; ~10-100x slower than a pandas UDF on the same
   logic).  The Arrow-batched operators (``ArrowEvalPythonExec`` for
   ``@pandas_udf``, the ``MapInPandas``/``MapInArrow``/
   ``FlatMapGroupsInPandas`` family) are the sanctioned Python paths
   and are NOT flagged.  The repo was row-UDF-free by discipline; this
   rule makes it row-UDF-free by gate.
3. **Forced fact-scale broadcast** — a join whose EXPLICITLY HINTED
   (``F.broadcast``) side scans a fact-scale table with no intervening
   aggregate/limit that reduces grain.  Only HINTED broadcasts are
   flagged: a stats-driven auto-broadcast at test SF is Spark doing its
   job (the same plan falls back to a shuffle join once the estimate
   crosses ``autoBroadcastJoinThreshold`` at scale), but an explicit
   hint stays forced at 100 TB — that is the "collect the fact table to
   the driver and ship it everywhere" bomb this rule exists for.  The
   hint survives only on the optimized LOGICAL plan's Join nodes
   (EliminateResolvedHint folds it there), so rule 3 walks
   ``optimizedPlan`` while rules 1–2 walk the physical plan.
   Round 11 extended the same reasoning to the HINT side of the
   policy: the Q6–Q8 report joins (``plans/reports.py``) dropped their
   explicit ``F.broadcast()`` hints on the dim_track/dim_album/weekly
   rollup sides entirely.  Those dims are entity-grain aggregates, so
   rule 3 always passed them — but a *hinted* broadcast never falls
   back, and at 100× an entity directory can outgrow the threshold.
   AQE's runtime statistics pick BroadcastHashJoin unhinted at every
   tested SF (verified on the sf0.1 physical plans, hashes unchanged)
   and degrade safely to a shuffle join at scale.  Keep explicit hints
   only for provably-bounded relations (enum/calendar grain spines).
   Round 12 applied that carve-out: Q8's new_tracks/new_artists weekly
   rollups aggregate to (year, week) calendar grain — bounded by the
   calendar, not the data — so their two joins got the hint back
   (plans/reports.py), recovering the AQE stage-barrier cost the
   round-11 un-hinting added; the entity-grain dim sides stay unhinted.

5. **Unbounded BroadcastNestedLoopJoin** — rule 2 catches
   ``CartesianProductExec``, but a ``crossJoin`` whose one side is
   small-but-unproven plans as ``BroadcastNestedLoopJoinExec`` without
   ever tripping it.  A BNLJ streams |probe| × |build| comparisons, so
   it is scale-safe ONLY when the broadcast build side is provably
   bounded: a global aggregate (no grouping keys ⇒ exactly one row — the
   one-row model-matrix spines), a limit node, or a one-row driver-local
   ``LocalTableScan``.  Any other build side (e.g. an un-aggregated
   filter over a table) is flagged: it may be small at test SF and
   fact-scale in production.  Like rule 3, legitimately-bounded shapes
   the walk cannot prove are allow-listed per query with justification.

Rules 1–2 walk the pre-AQE physical plan (``sparkPlan``) via py4j.  No
job execution is needed and the result is stable across adaptive
re-plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Tables whose unreduced broadcast is a scale bug.  The dimension-side
#: tables (region/nation/customer/supplier/part at TPC-H-ish ratios, and
#: the mart dims) stay broadcastable by design.
FACT_TABLES = ("events", "lineitem", "documents", "embeddings")

#: Logical node classes that reduce grain between a scan and a hinted
#: broadcast: an aggregate collapses to group keys, a limit bounds rows.
_REDUCING = (
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "Distinct",
    "Deduplicate",
    # per-batch Arrow transforms emit metadata-grain rows (multimodal)
    "MapInPandas",
    "MapInArrow",
    "PythonMapInArrow",
)

#: Nodes that bound the row count feeding a global window (the top-k /
#: rank-limit shapes): the single merge task sees at most k rows per
#: upstream partition, not the whole frame.
_BOUNDING = (
    "WindowGroupLimitExec",
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "CollectLimitExec",
)


def _children(jnode):
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.length())]


def _input_chain(jnode):
    """Walk only the UNARY input chain below a node: project / filter /
    sort / exchange / limit nodes preserve-or-reduce the row count, so a
    bounding node found here genuinely bounds the window's input.  The
    walk STOPS at any multi-child node (joins, unions): a limit on one
    branch of a join does not bound the merged frame (the join can
    re-inflate rows, and a limit on the build side says nothing about
    the probe side) — descending past them was rule 1's false-negative
    hole (round-6 advice)."""
    yield jnode
    kids = _children(jnode)
    while len(kids) == 1:
        node = kids[0]
        yield node
        kids = _children(node)


def _walk(jnode):
    yield jnode
    for c in _children(jnode):
        yield from _walk(c)


def _name(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _subtree_scans_fact(jnode) -> bool:
    """True if this LOGICAL subtree scans a fact-scale parquet table
    with no grain-reducing node between the scan and the subtree root."""
    if _name(jnode) in _REDUCING:
        return False
    if _name(jnode) in ("LogicalRelation", "DataSourceV2Relation", "DataSourceV2ScanRelation"):
        # toString omits the file path — read the relation's rootPaths
        try:
            paths = jnode.relation().location().rootPaths()
            desc = " ".join(
                paths.apply(i).toString() for i in range(paths.length())
            )
        except Exception:  # non-file relations (views, in-memory)
            desc = jnode.toString()
        return any(f"{t}.parquet" in desc for t in FACT_TABLES)
    return any(_subtree_scans_fact(c) for c in _children(jnode))


def _hinted_broadcast_sides(jnode):
    """Yield the logical child subtrees an explicit broadcast hint pins
    to the build side of this Join node (empty for un-hinted joins)."""
    if _name(jnode) != "Join":
        return
    hint = jnode.hint()
    for opt, idx in ((hint.leftHint(), 0), (hint.rightHint(), 1)):
        if opt.isDefined() and opt.get().strategy().isDefined():
            if "BROADCAST" in opt.get().strategy().get().toString().upper():
                yield _children(jnode)[idx]


#: Physical nodes that bound a BNLJ build side's row count outright.
_BNLJ_LIMITS = ("GlobalLimitExec", "CollectLimitExec", "LocalLimitExec")


def _bnlj_build_bounded(jnode) -> bool:
    """True if this PHYSICAL subtree provably produces a bounded (tiny)
    row count: a grouping-key-free aggregate (exactly one row), a limit,
    or a ≤1-row LocalTableScan.  Unary nodes pass through; a multi-child
    node (join/union of spines) is bounded iff every child is."""
    name = _name(jnode)
    if name in _BNLJ_LIMITS:
        return True
    if name.endswith("AggregateExec"):
        try:
            if jnode.groupingExpressions().isEmpty():
                return True
        except Exception:
            pass
    if name == "LocalTableScanExec":
        try:
            return jnode.rows().length() <= 1
        except Exception:
            return False
    kids = _children(jnode)
    if not kids:
        return False
    return all(_bnlj_build_bounded(c) for c in kids)


def lint_plan(
    df: DataFrame,
    *,
    allow_global_window: bool = False,
    allow_cartesian: bool = False,
    allow_fact_broadcast: bool = False,
    allow_row_python_udf: bool = False,
    allow_unbounded_bnlj: bool = False,
) -> list[str]:
    """Return a list of human-readable violations (empty = clean).

    The allow flags encode per-query adjudications ("this global window
    runs over a distinct-days frame"), so the test layer keeps ONE
    explicit allow-list per rule instead of silent exemptions.
    """
    plan = df._jdf.queryExecution().sparkPlan()
    violations: list[str] = []
    for node in _walk(plan):
        kind = _name(node)
        if kind == "WindowExec" and node.partitionSpec().isEmpty():
            bounded = any(
                _name(n) in _BOUNDING for n in _input_chain(node.child())
            )
            if allow_global_window or bounded:
                continue
            violations.append(
                "partition-less WindowExec (whole frame through one task): "
                + node.nodeName()
            )
        elif kind == "CartesianProductExec" and not allow_cartesian:
            violations.append("CartesianProductExec (unkeyed |L|x|R| join)")
        elif kind == "BatchEvalPythonExec" and not allow_row_python_udf:
            violations.append(
                "BatchEvalPythonExec (row-at-a-time Python UDF; use a "
                "pandas UDF / mapInPandas — Arrow-batched — instead)"
            )
        elif kind == "BroadcastNestedLoopJoinExec" and not allow_unbounded_bnlj:
            try:
                build_left = "BuildLeft" in node.buildSide().toString()
                candidates = [_children(node)[0 if build_left else 1]]
            except Exception:
                # Unreadable build side: don't guess BuildRight (the old
                # behavior could inspect the probe side and pass a bad
                # plan).  Conservatively accept only if EITHER child is
                # provably bounded — a bounded side caps the |L|x|R|
                # blow-up whichever role it plays (round-8 advice).
                candidates = list(_children(node))[:2]
            if not any(_bnlj_build_bounded(c) for c in candidates):
                violations.append(
                    "BroadcastNestedLoopJoin with an unproven build side "
                    "(no global aggregate / limit / one-row scan bounds "
                    "it; |probe|x|build| comparisons at scale)"
                )
    if not allow_fact_broadcast:
        logical = df._jdf.queryExecution().optimizedPlan()
        for node in _walk(logical):
            for side in _hinted_broadcast_sides(node):
                if _subtree_scans_fact(side):
                    violations.append(
                        "explicit broadcast hint over an unreduced "
                        "fact-table subtree (stays forced at scale)"
                    )
    return violations
