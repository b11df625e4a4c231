"""Planted-fixture ground truth for the round-10 additions whose oracles
mirror the same algorithm in SQL (parity alone could hide a shared
systematic bug): the link-prediction pair, the degree-MLE summary,
personalized PageRank, the Misra-Gries heavy-terms pass, readability,
tokenizer fertility, and the lagged cross-correlation."""

from __future__ import annotations

import math
from datetime import datetime


def test_jaccard_links_planted(spark, tmp_path):
    """4-cycle A-B-C-D: the two diagonals (A,C) and (B,D) are non-edges
    sharing BOTH neighbors — common=2, |union| = 2+2-2 = 2, J = 1.0 —
    and no other pair clears min_common."""
    from spotify_tracks_spark.operators.graph import (
        clear_copurchase_memo,
        parts_copurchase_jaccard_links,
    )

    A, B, C, D = 1, 2, 3, 4
    orders = {1: [A, B], 2: [B, C], 3: [C, D], 4: [D, A]}
    rows = [(o, p) for o, parts in orders.items() for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    clear_copurchase_memo()
    try:
        got = {
            (r.part_a, r.part_b): (r.common, r.jaccard)
            for r in parts_copurchase_jaccard_links(spark, str(tmp_path)).collect()
        }
    finally:
        clear_copurchase_memo()
    assert got == {(A, C): (2, 1.0), (B, D): (2, 1.0)}


def test_degree_powerlaw_planted(spark, tmp_path):
    """Same 4-cycle: 4 nodes of degree 2, 4 edges — mean 2.0 and the
    closed-form CSN alpha 1 + n/Σln(d/0.5) = 1 + 4/(4·ln 4)."""
    from spotify_tracks_spark.operators.graph import (
        clear_copurchase_memo,
        parts_copurchase_degree_powerlaw,
    )

    orders = {1: [1, 2], 2: [2, 3], 3: [3, 4], 4: [4, 1]}
    rows = [(o, p) for o, parts in orders.items() for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    clear_copurchase_memo()
    try:
        row = parts_copurchase_degree_powerlaw(spark, str(tmp_path)).collect()[0]
    finally:
        clear_copurchase_memo()
    assert (row.n_nodes, row.n_edges, row.min_deg, row.max_deg) == (4, 4, 2, 2)
    assert row.mean_deg == 2.0
    assert abs(row.alpha_mle - (1.0 + 4 / (4 * math.log(4.0)))) < 1e-6


def test_ppr_planted_mass_and_reach(spark, tmp_path):
    """Star (hub 1, leaves 2-6) plus a DISCONNECTED pair {7,8}: with
    n_seeds=2 the deterministic seed order picks hub 1 (deg 5) then
    node 2 (deg-1 tie broken by id).  Invariants: total walk mass is
    exactly 1 per round (undirected graph, no dangling nodes), the hub
    outranks every leaf, and the disconnected pair gets NO rows —
    sparse-reach is the operator's whole point."""
    from spotify_tracks_spark.operators.graph import (
        clear_copurchase_memo,
        parts_copurchase_ppr,
    )

    orders = {i: [1, i + 1] for i in range(1, 6)}  # star 1-{2..6}
    orders[6] = [7, 8]  # far component
    rows = [(o, p) for o, parts in orders.items() for p in parts]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    clear_copurchase_memo()
    try:
        got = {
            r.part_id: r.rank
            for r in parts_copurchase_ppr(spark, str(tmp_path), n_seeds=2).collect()
        }
    finally:
        clear_copurchase_memo()
    assert 7 not in got and 8 not in got
    assert abs(sum(got.values()) - 1.0) < 1e-4  # 6-dp rounding x |V| slack
    assert got[1] == max(got.values())
    assert all(got[1] > got[leaf] for leaf in (3, 4, 5, 6))


def test_heavy_terms_mg_exact_under_compress(spark, tmp_path):
    """Planted skew with k small enough to force the per-partition MG
    compress step repeatedly: token 'aa' (50 of 100) is the only one
    with freq·k > n at k=3; 'bb' (30) misses (90 < 100).  The exact
    recount pass must emit exactly the true heavy set with exact
    counts, across multiple partitions."""
    from spotify_tracks_spark.operators.text_analysis import text_heavy_terms_mg

    fillers = [f"f{i}" for i in range(20)]
    toks = ["aa"] * 50 + ["bb"] * 30 + fillers
    assert len(toks) == 100
    # spread tokens across 10 docs / several partitions
    docs = [
        (i, " ".join(toks[i * 10 : (i + 1) * 10]), "en", "test", 0)
        for i in range(10)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(4).write.parquet(f"{tmp_path}/documents.parquet")
    rows = text_heavy_terms_mg(spark, str(tmp_path), k=3).collect()
    got = {(r.token): (r.freq, r.n_total, r.share) for r in rows}
    assert got == {"aa": (50, 100, 0.5)}


def test_readability_planted(spark, tmp_path):
    """Hand-counted doc: 'Hello world. This is fun!' = 5 words, 2
    sentence-terminator runs, 6 vowel groups — Flesch 102.7775."""
    from spotify_tracks_spark.operators.text_analysis import text_readability

    spark.createDataFrame(
        [(1, "Hello world. This is fun!", "en", "test", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    row = text_readability(spark, str(tmp_path)).collect()[0]
    assert (row.n_words, row.n_sentences, row.n_syllables) == (5, 2, 6)
    expect = 206.835 - 1.015 * (5 / 2) - 84.6 * (6 / 5)
    assert abs(row.flesch - round(expect, 6)) < 1e-9


def test_tokenizer_fertility_planted(spark, tmp_path):
    """'hello world' is 2 WORD_RE words and 2 BPE_RE tokens ('hello',
    ' world') over 11 chars: fertility 1.0, 5.5 chars/token."""
    from spotify_tracks_spark.operators.llm_prep import corpus_tokenizer_fertility

    spark.createDataFrame(
        [(1, "hello world", "xx", "test", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    row = corpus_tokenizer_fertility(spark, str(tmp_path)).collect()[0]
    assert (row.lang, row.n_docs, row.n_words, row.n_bpe_tokens) == ("xx", 1, 2, 2)
    assert row.fertility == 1.0
    assert row.chars_per_bpe_token == 5.5


def test_lagged_crosscorr_planted(spark, tmp_path):
    """Purchases are clicks shifted +2 days with identical NON-MONOTONE
    daily counts (a linear ramp would score 1.0 at every lag): the CCF
    must read an exact 1.0 at lag_days=2 (y_day = day+2) and strictly
    less at every other reported lag."""
    from spotify_tracks_spark.operators.timeseries import events_lagged_crosscorr

    counts = [2, 1, 4, 1, 8, 1]
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1 + i), 1, "click", 0.0, "{}"))
            eid += 1
            rows.append((eid, datetime(2024, 1, 3 + i), 1, "purchase", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{tmp_path}/events.parquet")
    got = {
        r.lag_days: r.r
        for r in events_lagged_crosscorr(spark, str(tmp_path)).collect()
    }
    assert got[2] == 1.0
    assert all(v < 1.0 for lag, v in got.items() if lag != 2)
