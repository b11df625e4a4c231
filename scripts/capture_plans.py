"""Capture ``.explain("formatted")`` output for named queries.

Optimization-round deliverable: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters) against committed
``plans/r12/<query>_{before,after}.txt`` files (round 11's live under
``plans/r11/``).

Usage: python scripts/capture_plans.py <out_suffix> [sf_dir] <query ...>
  e.g. python scripts/capture_plans.py before /root/testdata/sf0.1 \
           parts_copurchase_kcore orders_basket_rules

Writes ``plans/r11/<query>_<out_suffix>.txt``.  Shared-artifact memos are
cleared first so each capture shows the full cold plan (the shape the
first family member per bench pass executes), and the memoized
checkpoint artifacts referenced by warm plans are noted as such.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from spotify_tracks_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    interiors = _interior_builders()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    for name in names:
        from spotify_tracks_spark import pipeline as _pipeline
        from spotify_tracks_spark.operators.dedup import clear_dedup_memo
        from spotify_tracks_spark.operators.graph import clear_copurchase_memo
        from spotify_tracks_spark.operators.llm_prep import clear_bpe_memo
        from spotify_tracks_spark.operators.similarity import clear_similarity_memo

        _pipeline._MEMO.clear()
        clear_copurchase_memo()
        clear_dedup_memo()
        clear_similarity_memo()
        clear_bpe_memo()
        spark.catalog.clearCache()

        interior = ""
        if name in interiors:
            idf = interiors[name](spark, sf_dir)
            interior = (
                "\n\n# ---- INTERIOR PLAN (the pre-checkpoint/pre-memo plan the\n"
                "# operator materializes at build time; the registered frame\n"
                "# above explains as a scan of the checkpointed result) ----\n\n"
                + idf._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n"
                "# NOTE: operators that end in localCheckpoint(eager=True)\n"
                "# materialize their heavy plan at build time; the final\n"
                "# frame then explains as a scan of checkpointed blocks.\n"
                "# For those, the interior plan is captured from the\n"
                "# pre-checkpoint frame where the operator exposes one.\n\n"
            )
            fh.write(plan)
            fh.write(interior)
        print(f"wrote {path}")
    spark.stop()
    return 0


def _interior_builders():
    """Pre-checkpoint plan builders for the operators whose registered
    frame explains as an RDD scan (session-memoized / checkpointed
    outputs).  Each returns the LAZY interior frame whose materialization
    the operator pays at build time — the plan the judge should read."""
    from pyspark.sql import functions as F

    from spotify_tracks_spark.operators import dedup as d
    from spotify_tracks_spark.operators import similarity as s

    def jej(spark, sf_dir, threshold=0.8):
        # dedup_jaccard_exact_join minus the final localCheckpoint: the
        # registered default threshold over the memoized shingle table
        sh = d.shingle_hash_sets(spark, sf_dir)
        post = sh.select("doc_id", F.explode("hs").alias("tok"))
        dfreq = post.groupBy("tok").agg(F.count("*").alias("df"))
        ranked = (
            post.join(dfreq, "tok")
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list(F.struct("df", "tok"))).alias("sorted"))
            .select(
                "doc_id",
                F.transform("sorted", lambda st: st["tok"]).alias("toks"),
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

        def idx_len(ncol):
            return (
                ncol
                - F.ceil(
                    ncol * F.lit(2.0 * threshold / (1.0 + threshold)) - F.lit(1e-9)
                ).cast("int")
                + 1
            )

        ia, jb = F.col("a.pos") + 1, F.col("b.pos") + 1
        idx_ok = (
            ((F.col("a.n") <= F.col("b.n")) & (ia <= idx_len(F.col("a.n"))))
            | ((F.col("b.n") <= F.col("a.n")) & (jb <= idx_len(F.col("b.n"))))
        )
        cands = (
            prefixes.alias("a")
            .join(
                prefixes.alias("b"),
                (F.col("a.tok") == F.col("b.tok"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & size_ok
                & idx_ok,
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        ja = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hsa"))
        jb_ = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hsb"))
        n_inter = F.size(F.array_intersect("hsa", "hsb"))
        jac = n_inter / (F.size("hsa") + F.size("hsb") - n_inter)
        return (
            cands.join(ja, "doc_a")
            .join(jb_, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )

    def ngram(spark, sf_dir):
        return d._ngram_jaccard_pairs(
            0.5, d.NGRAM_MAX_BLOCK, d.shingle_hash_sets(spark, sf_dir), []
        )

    def basket(spark, sf_dir):
        # orders_basket_rules minus the final localCheckpoint (same
        # constants as the registered defaults); the persisted basket
        # table appears as an InMemoryTableScan feeding all 3 consumers
        from spotify_tracks_spark.operators.tpch_shapes import (
            BASKET_MAX_ORDER_ITEMS,
            BASKET_MIN_SUPPORT,
        )
        from spotify_tracks_spark.sources.tables import read_table

        grouped = (
            read_table(spark, sf_dir, "lineitem", spread=True)
            .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
            .groupBy("o")
            .agg(F.sort_array(F.collect_set("p")).alias("ps"))
            .filter(F.size("ps") <= BASKET_MAX_ORDER_ITEMS)
        )
        item = (
            grouped.select(F.explode("ps").alias("p"))
            .groupBy("p")
            .agg(F.count("*").alias("n_item"))
        )
        pairs = (
            grouped.filter(F.size("ps") >= 2)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.slice("ps", 1, F.size("ps") - 1),
                            lambda x, i: F.transform(
                                F.slice(F.col("ps"), i + 2, F.size("ps")),
                                lambda y: F.struct(x.alias("x"), y.alias("y")),
                            ),
                        )
                    )
                ).alias("e")
            )
            .groupBy(F.col("e.x").alias("part_a"), F.col("e.y").alias("part_b"))
            .agg(F.count("*").alias("n_ab"))
            .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
        )
        return pairs.join(
            item.select(F.col("p").alias("part_a"), F.col("n_item").alias("n_a")),
            "part_a",
        ).join(
            item.select(F.col("p").alias("part_b"), F.col("n_item").alias("n_b")),
            "part_b",
        )

    return {
        "dedup_jaccard_exact_join": jej,
        "dedup_ngram_jaccard": ngram,
        "orders_basket_rules": basket,
        "ann_topk_lsh": lambda sp, sf: s._ann_topk_lsh_plan(sp, sf, 5, 100, 8),
        "ann_topk_ivf": lambda sp, sf: s._ann_topk_ivf_plan(sp, sf, 5, 100, 16, 1),
        "ann_topk_pq": lambda sp, sf: s._ann_topk_pq_plan(sp, sf, 5, 100, 8, 16),
        "ann_topk_ivfpq": lambda sp, sf: s._ann_topk_ivfpq_plan(
            sp, sf, 5, 100, 16, 2, 8, 16
        ),
    }


if __name__ == "__main__":
    sys.exit(main())
