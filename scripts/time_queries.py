"""Isolated per-query timing with the bench methodology (round-11 tool).

Runs the named queries in the given order with cold shared-artifact
memos (cleared once at the start, NOT between queries — so intra-family
sharing shows up exactly as it does inside one bench pass), times each
via the noop sink, and prints per-query seconds for N repetitions.

Usage: python scripts/time_queries.py [-n reps] [sf_dir] <query ...>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from spotify_tracks_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if os.path.isdir(args[0]) else args
    spark = get_spark("time_queries")
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}

    from spotify_tracks_spark import pipeline as _pipeline
    from spotify_tracks_spark.operators.dedup import clear_dedup_memo
    from spotify_tracks_spark.operators.graph import clear_copurchase_memo
    from spotify_tracks_spark.operators.llm_prep import clear_bpe_memo
    from spotify_tracks_spark.operators.similarity import clear_similarity_memo

    # warm the python-worker daemons + codegen like bench.py startup
    n_cores = spark.sparkContext.defaultParallelism
    spark.range(0, n_cores * 2, 1, n_cores * 2).mapInPandas(
        lambda it: it, "id: long"
    ).write.format("noop").mode("overwrite").save()
    entry_mod.entry(spark).write.format("noop").mode("overwrite").save()

    for r in range(reps):
        _pipeline._MEMO.clear()
        clear_copurchase_memo()
        clear_dedup_memo()
        clear_similarity_memo()
        clear_bpe_memo()
        spark.catalog.clearCache()
        for name in names:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"pass{r}  {dt:8.3f}s  {name}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
