"""Time-vs-scale-factor curves for the heavy operator families.

The 100×-scale claim for the graph / dedup / ANN / BPE / streaming-fold
families has so far rested on plan-shape arguments (the 5-rule plan
linter + explain audits).  This script adds OBSERVED scaling evidence
(round-9 verdict item 3): it times each family's carrier + a warm
consumer at a ladder of scale factors and reports the growth exponent
between consecutive rungs, so a family bending worse than ~O(n log n)
shows up as a number, not a vibe.

Two fixture ladders, both reported in the SCALE section of BASELINE.md:

1. the DRIVER set (/root/testdata, sf0.001 → 0.1 — a true 100× span on
   the data every anchor was measured on), and
2. a SYNTHETIC extension from ``scripts/gen_testdata.py`` (same
   generator across rungs so cross-sf ratios are apples-to-apples).
   CAVEAT: the synthetic co-purchase graph is ~30× DENSER than the
   driver set's (avg degree ~119 vs ~4 at comparable sf — the generator
   draws parts near-uniformly), so graph-family rungs there measure a
   much harder absolute workload per row; use the within-ladder
   exponents, never cross-ladder absolute times.

``SCALE_TARGETS=a,b,c`` (env) restricts the target list — the dense
synthetic graph makes the wedge-join families expensive above sf0.2.

Protocol per sf rung: fresh memo state (the same cold-cache discipline
bench.py uses), then a FIXED execution order so carrier attribution is
identical on every rung:

  triangles            pays the co-purchase edge build + the wedge join
  eigencentrality      warm edges, 5 power-iteration rounds
  jaccard_exact_join   pays the shingle-table build + prefix-filter join
  clusters_star        pays the minhash pair-set build + star rounds
  ann_recall_eval_all  pays the exact ANN baseline + 5 index evals
  corpus_bpe_encode    pays the BPE train, then encodes the corpus
  events_stream_kmv    streaming sketch fold (micro-batch drain)
  ngram_jaccard_uncapped  exhaustive blocked-Jaccard verify

Each query runs twice per rung (min taken) through the noop sink — full
plan execution, nothing collected.  Output: one JSON blob on stdout plus
a per-rung growth table on stderr.

Usage: python scripts/scale_curves.py [ROOT] [SF ...]
       (defaults: ROOT=/tmp/scale_fixtures, SF = 0.05 0.1 0.2 0.5)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_tracks_spark.session import get_spark  # noqa: E402


def _targets():
    from spotify_tracks_spark.operators import dedup as _d
    from spotify_tracks_spark.operators import graph as _g
    from spotify_tracks_spark.operators import llm_prep as _l
    from spotify_tracks_spark.operators import similarity as _s
    import __spark_entry__ as em

    ex = {**em.queries(), **em.extra_queries()}
    return [
        ("triangles", _g.parts_copurchase_triangles),
        ("eigencentrality", _g.parts_copurchase_eigencentrality),
        ("jaccard_exact_join", _d.dedup_jaccard_exact_join),
        ("clusters_star", _d.dedup_clusters_star),
        ("ann_recall_eval_all", _s.ann_recall_eval_all),
        ("corpus_bpe_encode", _l.corpus_bpe_encode),
        ("events_stream_kmv", ex["events_stream_kmv"]),
        ("ngram_jaccard_uncapped", ex["dedup_ngram_jaccard_uncapped"]),
        # round-10 session-2 heavy additions (driver-ladder evidence)
        ("ppr", _g.parts_copurchase_ppr),
        ("modularity", _g.parts_copurchase_modularity),
        ("heavy_terms_mg", ex["text_heavy_terms_mg"]),
        ("top_component", ex["embedding_top_component"]),
        ("source_divergence", ex["corpus_source_divergence"]),
        # round-11: the CAPPED production shapes, laddered alongside the
        # exhaustive forms so the cap's scale value is an observed
        # number, not an argument (uncapped blocked-Jaccard is
        # Θ(Σ block²) by definition on any corpus with common shingles)
        ("ngram_jaccard_capped", ex["dedup_ngram_jaccard"]),
        ("minhash_lsh", ex["dedup_minhash_lsh"]),
    ]


def _clear_memos():
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


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_fixtures"
    sfs = [float(s) for s in sys.argv[2:]] or [0.05, 0.1, 0.2, 0.5]
    spark = get_spark("scale-curves")
    targets = _targets()

    only = os.environ.get("SCALE_TARGETS")
    if only:
        keep = set(only.split(","))
        targets = [(n, f) for n, f in targets if n in keep]

    # one throwaway pass at the smallest rung to amortize codegen JIT /
    # Python-worker forks out of the rung-1 numbers
    warm_dir = os.path.join(root, f"sf{sfs[0]:g}")
    _clear_memos()
    for name, fn in targets:
        t = time.perf_counter()
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            print(f"warmup {name}: {time.perf_counter() - t:.1f}s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warmup {name} failed: {e}", file=sys.stderr, flush=True)

    results: dict[str, dict[str, float]] = {}
    for sf in sfs:
        sf_dir = os.path.join(root, f"sf{sf:g}")
        rung: dict[str, list[float]] = {}
        for _pass in range(2):
            _clear_memos()
            spark.catalog.clearCache()
            for name, fn in targets:
                t = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                except Exception as e:  # noqa: BLE001
                    print(f"sf{sf:g} {name} FAILED: {e}", file=sys.stderr,
                          flush=True)
                    continue
                dt = round(time.perf_counter() - t, 3)
                rung.setdefault(name, []).append(dt)
                print(f"  sf{sf:g} pass{_pass + 1} {name}: {dt}s",
                      file=sys.stderr, flush=True)
        results[f"{sf:g}"] = {n: min(ts) for n, ts in rung.items()}
        print(f"sf{sf:g}: {results[f'{sf:g}']}", file=sys.stderr, flush=True)

    # growth exponents between consecutive rungs: t2/t1 = (sf2/sf1)^alpha
    # → alpha = log(t2/t1)/log(sf2/sf1).  alpha ≈ 1 is linear; report the
    # last-rung alpha (most load, least fixed-cost pollution) per query.
    exponents: dict[str, list[float]] = {}
    for (a, b) in zip(sfs, sfs[1:]):
        ka, kb = f"{a:g}", f"{b:g}"
        for name in results.get(ka, {}):
            if name in results.get(kb, {}) and results[ka][name] > 0:
                alpha = math.log(results[kb][name] / results[ka][name]) / math.log(b / a)
                exponents.setdefault(name, []).append(round(alpha, 2))
    print("growth exponents per rung step:", file=sys.stderr)
    for name, alphas in exponents.items():
        print(f"  {name}: {alphas}", file=sys.stderr)

    print(json.dumps({"sfs": sfs, "times": results, "alphas": exponents}))
    spark.stop()


if __name__ == "__main__":
    main()
