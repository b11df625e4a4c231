"""A/B the PPJoin positional upper-bound filter on ladder-scale text.

Round-11 deferred the positional filter (4% pruning at sf0.1); the
round-11 verdict item 4 ordered a re-measurement on ladder fixtures
(>= sf0.2) where documents are longer.  This script builds the exact
join's interior plan twice — with and without the positional
predicate — over the SAME memoized shingle table and reports candidate
counts and verify wall-clock for each, plus result-row equality (the
filter must be lossless).

Usage: python scripts/ppjoin_pos_ab.py [sf_dir] [threshold]
       (defaults: /tmp/scale_fixtures/sf0.2, 0.8)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spotify_tracks_spark.operators import dedup as d  # noqa: E402
from spotify_tracks_spark.session import get_spark  # noqa: E402


def build(sh, threshold: float, positional: bool):
    post = sh.select("doc_id", F.explode("hs").alias("tok"))
    dfreq = post.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (
        post.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "tok"))).alias("sorted"))
        .select(
            "doc_id",
            F.transform("sorted", lambda s: s["tok"]).alias("toks"),
            F.size("sorted").alias("n"),
        )
    )
    pref_len = F.col("n") - F.ceil(F.col("n") * F.lit(threshold)).cast("int") + 1
    prefixes = ranked.select(
        "doc_id", "n", F.posexplode(F.slice("toks", 1, pref_len)).alias("pos", "tok")
    )
    size_ok = F.least(F.col("a.n"), F.col("b.n")) >= (
        F.greatest(F.col("a.n"), F.col("b.n")) * F.lit(threshold)
    )

    def _idx_len(ncol):
        return (
            ncol
            - F.ceil(
                ncol * F.lit(2.0 * threshold / (1.0 + threshold)) - F.lit(1e-9)
            ).cast("int")
            + 1
        )

    ia, jb = F.col("a.pos") + 1, F.col("b.pos") + 1
    idx_ok = (
        ((F.col("a.n") <= F.col("b.n")) & (ia <= _idx_len(F.col("a.n"))))
        | ((F.col("b.n") <= F.col("a.n")) & (jb <= _idx_len(F.col("b.n"))))
    )
    cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & size_ok
        & idx_ok
    )
    if positional:
        ubound = F.least(ia - 1, jb - 1) + 1 + F.least(
            F.col("a.n") - ia, F.col("b.n") - jb
        )
        cond = cond & (
            ubound.cast("double")
            >= F.lit(threshold / (1.0 + threshold)) * (F.col("a.n") + F.col("b.n"))
            - F.lit(1e-9)
        )
    cands = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), cond)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ja = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hsa"))
    jb_ = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hsb"))
    n_inter = F.size(F.array_intersect("hsa", "hsb"))
    jac = n_inter / (F.size("hsa") + F.size("hsb") - n_inter)
    full = (
        cands.join(ja, "doc_a")
        .join(jb_, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return cands, full


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_fixtures/sf0.2"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = get_spark("ppjoin_pos_ab")
    sh = d.shingle_hash_sets(spark, sf_dir)  # memoized; both variants share it
    sh.count()
    results = {}
    order = (
        (True, False)
        if os.environ.get("PPJOIN_AB_ORDER") == "pos_first"
        else (False, True)
    )
    for positional in order:
        tag = "pos" if positional else "base"
        cands, full = build(sh, threshold, positional)
        n_cands = cands.count()
        best = float("inf")
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"jej:{tag}")
            t0 = time.perf_counter()
            full.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        n_rows = full.count()
        results[tag] = (n_cands, best, n_rows)
        print(
            f"{tag}: candidates={n_cands:,}  join+verify min_of_2={best:.2f}s  "
            f"result_rows={n_rows}",
            flush=True,
        )
    (c0, t0_, r0), (c1, t1_, r1) = results["base"], results["pos"]
    print(
        f"pruning={(1 - c1 / c0) * 100:.1f}%  speedup={t0_ / t1_:.2f}x  "
        f"rows_equal={r0 == r1}",
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
