"""Semantics tests for events_profile, ann_recall_eval, and
dedup_paragraph on planted fixtures (oracle parity runs separately in
test_extra_parity.py)."""

from __future__ import annotations

from datetime import datetime

from spotify_tracks_spark.operators.dedup import PARA_TOKENS, dedup_paragraph
from spotify_tracks_spark.operators.profile import events_profile
from spotify_tracks_spark.operators.similarity import ann_recall_eval

from .conftest import SF_SMOKE


def test_profile_counts_planted(spark, tmp_path):
    d = datetime
    rows = [
        (0, d(2024, 1, 1), 1, "view", 1.5, "{}"),
        (1, d(2024, 1, 2), 1, "click", None, "{}"),
        (2, d(2024, 1, 2), None, "view", 3.5, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    prof = {r.column_name: r for r in events_profile(spark, str(tmp_path)).collect()}
    assert set(prof) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    assert all(r.n_rows == 3 for r in prof.values())
    assert (prof["user_id"].n_nulls, prof["user_id"].n_distinct) == (1, 1)
    assert (prof["value"].n_nulls, prof["value"].n_distinct) == (1, 2)
    assert (prof["event_type"].n_nulls, prof["event_type"].n_distinct) == (0, 2)
    assert prof["ts"].n_distinct == 2
    assert (prof["value"].min_num, prof["value"].max_num) == (1.5, 3.5)
    # string columns profile counts only — no numeric range
    assert prof["props"].min_num is None and prof["props"].max_num is None


def test_recall_bounds_and_degenerate_bucket_is_perfect(spark):
    out = ann_recall_eval(spark, SF_SMOKE).collect()
    assert out, "no probes evaluated"
    for r in out:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hits <= r.n_exact
    # dims=0 puts every vector in one bucket: LSH degenerates to exact
    # brute force, so measured recall must be exactly 1 for every probe
    perfect = ann_recall_eval(spark, SF_SMOKE, dims=0).collect()
    assert perfect and all(r.recall == 1.0 for r in perfect)


def test_paragraph_dedup_first_wins(spark, tmp_path):
    chunk_a = " ".join(f"w{i}" for i in range(PARA_TOKENS))
    chunk_b = " ".join(f"x{i}" for i in range(PARA_TOKENS))
    chunk_c = " ".join(f"y{i}" for i in range(PARA_TOKENS))
    rows = [
        (0, f"{chunk_a} {chunk_b}"),      # original: 2 chunks, 0 dups
        (1, f"{chunk_c} {chunk_a}"),      # repeats chunk_a → 1 of 2 dup
        (2, f"{chunk_a} {chunk_b}"),      # full copy of doc 0 → all dup
    ]
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in dedup_paragraph(spark, str(tmp_path)).collect()}
    assert (got[0].n_paras, got[0].n_dup_paras, got[0].is_mostly_dup) == (2, 0, False)
    assert (got[1].n_paras, got[1].n_dup_paras, got[1].is_mostly_dup) == (2, 1, False)
    assert (got[2].n_paras, got[2].n_dup_paras, got[2].is_mostly_dup) == (2, 2, True)


def test_quantize_planted_codes_and_clamps(spark, tmp_path):
    from spotify_tracks_spark.operators.similarity import embedding_quantize

    spark.createDataFrame(
        [(0, [0.0, 10.0], 0), (1, [10.0, 10.0], 0)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(f"{tmp_path}/embeddings.parquet")
    got = {r.vec_id: r for r in embedding_quantize(spark, str(tmp_path)).collect()}
    # dim 1 range [0, 10]: x=0 → code 0; x=10 → floor(256) clamps to 255
    # dim 2 constant: zero range codes to 0 with zero reconstruction error
    assert (got[0].code_min, got[0].code_max, got[0].code_sum) == (0, 0, 0)
    assert (got[1].code_min, got[1].code_max, got[1].code_sum) == (0, 255, 255)
    step = 10.0 / 256
    assert abs(got[0].mse - (step / 2) ** 2 / 2) < 1e-9  # dim2 contributes 0
    assert abs(got[1].mse - (step / 2) ** 2 / 2) < 1e-9  # clamp hits midpoint too
    assert all(r.n_dims == 2 for r in got.values())


def test_bigram_lm_separates_fluent_from_garbage(spark, tmp_path):
    from spotify_tracks_spark.operators.text_analysis import text_bigram_lm_score

    fluent = "the cat sat on the mat and the hat " * 5
    rows = [(i, fluent) for i in range(9)] + [(9, "zq xj qv kz jx vq zq xj qv kz")]
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in text_bigram_lm_score(spark, str(tmp_path)).collect()}
    garbage, typical = got[9].mean_loglik, got[0].mean_loglik
    assert garbage < typical  # rare bigrams → lower likelihood
    assert all(r.mean_loglik < 0 for r in got.values())  # log of probs < 1
    assert got[0].n_bigrams == len(fluent) - 1


def test_key_skew_ranks_and_shares(spark):
    from spotify_tracks_spark.operators.analytics import SKEW_TOP_N, events_key_skew

    rows = events_key_skew(spark, SF_SMOKE).collect()
    assert len(rows) == SKEW_TOP_N
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, SKEW_TOP_N + 1))
    counts = [r.n_events for r in by_rank]
    assert counts == sorted(counts, reverse=True)
    assert 0 < sum(r.share for r in rows) <= 1.0


def test_pq_codebook_vectors_code_to_themselves(spark):
    from spotify_tracks_spark.operators.similarity import (
        PQ_CODEBOOK,
        embedding_pq,
    )
    from spotify_tracks_spark.sources.tables import read_table

    cent_ids = [
        r.vec_id
        for r in read_table(spark, SF_SMOKE, "embeddings")
        .orderBy("vec_id")
        .limit(PQ_CODEBOOK)
        .collect()
    ]
    got = {r.vec_id: r for r in embedding_pq(spark, SF_SMOKE).collect()}
    for rank, vid in enumerate(cent_ids):
        r = got[vid]
        # a codebook member's own subvectors are centroids: zero residual,
        # and every subspace picks the same code (its own rank)
        assert r.distortion == 0.0, vid
        assert r.code_min == r.code_max == rank, vid
    assert all(r.distortion >= 0 for r in got.values())


def test_pq_adc_search_is_ranked_and_nonnegative(spark):
    from spotify_tracks_spark.operators.similarity import ann_topk_pq

    rows = ann_topk_pq(spark, SF_SMOKE).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        adcs = [r.adc for r in rs]
        assert all(a >= 0 for a in adcs) and adcs == sorted(adcs), q
        assert all(r.neighbor_id != q for r in rs)


def test_edit_distance_catches_lsh_invisible_pairs(spark, tmp_path):
    """Round-4 contract: dedup_edit_distance must find order-drift pairs
    that minhash-LSH banding cannot (low set-Jaccard, near-identical
    prefix) via its independent prefix-bucket candidate source — one pair
    per bucket direction (shared head block / shared tail block)."""
    from spotify_tracks_spark.operators.dedup import (
        dedup_edit_distance,
        dedup_minhash_lsh,
    )

    h24 = "alpha beta gamma delta e"          # 24 chars — head-block key
    seg = "common forty char middle segment padding"  # 40 chars -> prefix64
    assert len(h24) == 24 and len(seg) == 40
    # NB: _norm lowercases, so typos must be real character substitutions
    seg_typo = "common forth chat niddle segment padding"  # 3 substitutions
    h24_typo = "alphabbeta gamna delta e"                  # 2 substitutions
    t24 = "shared tail block twenty"                       # 24 chars
    assert len(t24) == 24

    def body(ch: str) -> str:
        # 300 chars of one repeated word — shingle sets disjoint per ch
        return (" " + ch * 9) * 30

    rows = [
        # pair (1, 2): identical head block, typos at 25..64, bodies differ
        (1, h24 + seg + body("q")),
        (2, h24 + seg_typo + body("w")),
        # pair (3, 4): typos INSIDE the head block, identical tail block
        (3, h24 + seg + body("x") + t24),
        (4, h24_typo + seg + body("z") + t24),
        # unrelated filler
        (5, "totally unrelated document about something else entirely"),
        (6, "another unrelated filler document with different words"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, str(tmp_path)).collect()
    }
    # the planted pairs are invisible to set-overlap banding (low Jaccard)
    assert (1, 2) not in lsh and (3, 4) not in lsh

    got = {
        (r.doc_a, r.doc_b): r.edit_distance
        for r in dedup_edit_distance(spark, str(tmp_path)).collect()
    }
    assert got[(1, 2)] == 3   # via the head bucket
    assert got[(3, 4)] == 2   # via the tail bucket (head differs)
    assert (5, 6) not in got


def test_jaccard_exact_join_is_complete(spark):
    """The prefix-filter join's lossless claim, pinned the hard way:
    brute-force all-pairs exact Jaccard over the smoke corpus must equal
    the prefix-filtered result pair-for-pair (any missing pair breaks
    the Chaudhuri completeness argument; any extra pair the verify)."""
    from pyspark.sql import functions as F

    from spotify_tracks_spark.operators.dedup import (
        _with_shingle_hash_sets,
        dedup_jaccard_exact_join,
    )
    from spotify_tracks_spark.sources.tables import read_table
    from tests.conftest import SF_SMOKE

    sh = _with_shingle_hash_sets(
        read_table(spark, SF_SMOKE, "documents")
    ).persist()
    sh.count()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hsa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hsb"))
    n_inter = F.size(F.array_intersect("hsa", "hsb"))
    jac = n_inter / (F.size("hsa") + F.size("hsb") - n_inter)
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_jaccard_exact_join(spark, SF_SMOKE, threshold=0.5).collect()
    }
    sh.unpersist()
    assert got == brute and len(brute) > 0


def test_quantile_hist_error_bound(spark):
    """The histogram-quantile sketch's value-domain guarantee: the
    DISCRETE p-quantile (percentile_disc — the smallest value whose
    cume_dist ≥ p, i.e. the order statistic at the crossing rank) lies
    in the bin whose cumulative count crosses p·n, and the interpolated
    estimate lies in the SAME bin — so |est − percentile_disc| ≤ one
    bin width, per (type, p).  (The CONTINUOUS percentile interpolates
    toward the next order statistic, which can sit bins away across an
    empty stretch, so no fixed value bound exists for it — the reason
    the pin targets the discrete form.)"""
    from pyspark.sql import functions as F

    from spotify_tracks_spark.operators.profile import (
        HIST_BINS,
        QUANTILE_HIST_PS,
        events_quantile_hist,
    )
    from spotify_tracks_spark.sources.tables import read_table

    from .conftest import SF_SMOKE

    est = {
        (r.event_type, r.p): r.est
        for r in events_quantile_hist(spark, SF_SMOKE).collect()
    }
    ev = read_table(spark, SF_SMOKE, "events")
    exact_rows = ev.groupBy("event_type").agg(
        *[
            F.expr(
                f"percentile_disc({p}) within group (order by value)"
            ).alias(f"q{i}")
            for i, p in enumerate(QUANTILE_HIST_PS)
        ],
        ((F.max("value") - F.min("value")) / HIST_BINS).alias("w"),
    ).collect()
    assert est, "no estimates emitted"
    for row in exact_rows:
        for i, p in enumerate(QUANTILE_HIST_PS):
            got = est[(row.event_type, p)]
            assert abs(got - row[f"q{i}"]) <= row.w + 1e-9, (
                row.event_type,
                p,
                got,
                row[f"q{i}"],
                row.w,
            )


def test_naive_bayes_langid_separates_planted_languages(spark, tmp_path):
    """On a planted corpus whose three languages use disjoint character
    inventories the trained NB classifier must recover every label
    perfectly.  (The sf fixture can NOT support this pin: its documents
    share one vocabulary across all lang labels — lang is statistically
    independent of text there, so ~chance accuracy is the ceiling for
    ANY classifier; the oracle-parity test covers that corpus.)"""
    from spotify_tracks_spark.operators.text_analysis import (
        text_naive_bayes_langid,
    )

    vocab = {
        "aa": ["abad", "bace", "cafe", "dade"],
        "bb": ["wuxy", "xyzu", "yuwz", "zxvw"],
        "cc": ["mnop", "nopq", "opqm", "pqmn"],
    }
    rows = []
    doc_id = 0
    for lang, words in vocab.items():
        for i in range(8):
            text = " ".join(words[(i + j) % 4] for j in range(12))
            rows.append((doc_id, text, lang, "planted", len(text)))
            doc_id += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    out = text_naive_bayes_langid(spark, str(tmp_path)).collect()
    assert {(r.lang_actual, r.lang_pred, r.n_docs) for r in out} == {
        ("aa", "aa", 8), ("bb", "bb", 8), ("cc", "cc", 8)
    }
