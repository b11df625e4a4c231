"""Skew-handling join utility: key salting.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime, but it only splits *sort-merge* partitions; a pathologically hot
key joined against a non-broadcastable build side still serializes one
reducer.  ``salted_join`` is the explicit escape hatch: the probe side
scatters each row to one of ``n_salts`` sub-keys (deterministically, from
a hash of the full row, so retries/speculative tasks agree), the build
side replicates every row to all sub-keys, and the join key becomes
(key, salt) — the hot key's work spreads over ``n_salts`` reducers at the
cost of replicating the build side ``n_salts``×.

Use when: probe side skewed, build side too big to broadcast but small
enough to replicate n_salts times.  Results are *identical* to the plain
join (asserted by tests) — salting is pure execution strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALTS = 8


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``on`` with an added salt sub-key.

    Supports inner and left joins (the probe side keeps its grain)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    p = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = p.join(b, [*on, "_salt"], how)
    return out.drop("_salt")
