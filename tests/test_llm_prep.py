"""Semantics tests for the LLM-prep operators (operators/llm_prep.py) —
planted-fixture checks the hash-parity gate can't express (the testdata
corpus contains no real PII, so the oracle alone would only prove
zero-match agreement).  Oracle parity itself runs in test_extra_parity.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spotify_tracks_spark.operators.llm_prep import (
    BENCHMARK_MOD,
    PACK_CAPACITY,
    corpus_contamination,
    corpus_pack_sequences,
    text_pii_redact,
)
from spotify_tracks_spark.sources.tables import read_table

from .conftest import SF_SMOKE


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_pii_redact_planted(spark, tmp_path):
    cases = {
        0: ("contact bob@example.com or +4915112345678 now", 1, 0, 1,
            "contact <EMAIL> or <PHONE> now"),
        1: ("server at 10.0.0.1 and 192.168.1.255 fine", 0, 2, 0,
            "server at <IP> and <IP> fine"),
        # the IP-shaped local part belongs to the email match: one email,
        # zero IPs (counts run over progressively redacted text)
        2: ("mail 1.2.3.4@host.com please", 1, 0, 0, "mail <EMAIL> please"),
        3: ("nothing sensitive here", 0, 0, 0, "nothing sensitive here"),
    }
    sf = _write_docs(spark, tmp_path, [(i, t) for i, (t, *_) in cases.items()])
    got = {r.doc_id: r for r in text_pii_redact(spark, sf).collect()}
    for i, (_, n_email, n_ip, n_phone, redacted) in cases.items():
        r = got[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == (n_email, n_ip, n_phone), i
        assert r.redacted_md5 == hashlib.md5(redacted.encode()).hexdigest(), i
        assert r.n_chars_redacted == len(redacted), i


def test_contamination_flags_benchmark_and_bounds(spark):
    rows = corpus_contamination(spark, SF_SMOKE).collect()
    n_docs = read_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.n_matched <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0
        assert r.is_benchmark == (r.doc_id % BENCHMARK_MOD == 0)
        if r.is_benchmark:
            # every benchmark shingle is in the benchmark set by definition
            assert r.contamination == 1.0 and r.is_contaminated


def test_pack_sequences_is_concat_then_chunk(spark):
    got = sorted(
        corpus_pack_sequences(spark, SF_SMOKE).collect(), key=lambda r: r.doc_id
    )
    toks = {
        r.doc_id: r.n
        for r in read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    cum = 0
    prev_pack = 0
    for r in got:
        assert r.n_tokens == toks[r.doc_id]
        # exact concat-then-chunk arithmetic against a serial replay
        assert r.pack_id == cum // PACK_CAPACITY
        assert r.pack_offset == cum % PACK_CAPACITY
        assert 0 <= r.pack_offset < PACK_CAPACITY
        assert r.pack_id >= prev_pack
        prev_pack = r.pack_id
        cum += r.n_tokens


def test_repetition_planted(spark, tmp_path):
    from spotify_tracks_spark.operators.llm_prep import text_repetition

    boiler = "\n".join(["all work and no play"] * 10)          # 1 distinct line of 10
    # every token unique → every line AND every bigram distinct
    varied = "\n".join(f"a{i} b{i} c{i} d{i} e{i}" for i in range(10))
    looped = " ".join(["spam ham"] * 40)                        # bigram loop, one line
    sf = _write_docs(spark, tmp_path, [(0, boiler), (1, varied), (2, looped)])
    got = {r.doc_id: r for r in text_repetition(spark, sf).collect()}
    assert got[0].dup_line_frac == 0.9 and got[0].is_repetitive
    assert got[1].dup_line_frac == 0.0
    assert not got[1].is_repetitive
    # "spam ham spam ham ..." has only 2 distinct bigrams
    assert got[2].dup_bigram_frac > 0.9 and got[2].is_repetitive


def test_repetition_bounds_on_corpus(spark):
    from spotify_tracks_spark.operators.llm_prep import text_repetition

    for r in text_repetition(spark, SF_SMOKE).collect():
        assert 0.0 <= r.dup_line_frac < 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        assert r.n_lines >= 1 and r.n_bigrams >= 1


def test_scd2_planted_islands(spark, tmp_path):
    import datetime as dt

    from spotify_tracks_spark.operators.analytics import events_scd2_user_state

    ts = lambda h: dt.datetime(2024, 3, 1, h)  # noqa: E731
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            # user 1: view,view,click,view -> 3 islands
            (1, ts(1), 1, "view", 1.0, "{}"),
            (2, ts(2), 1, "view", 1.0, "{}"),
            (3, ts(3), 1, "click", 1.0, "{}"),
            (4, ts(4), 1, "view", 1.0, "{}"),
            # user 2: single state -> 1 current island
            (5, ts(1), 2, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    rows = sorted(
        events_scd2_user_state(spark, sf).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    u1 = [r for r in rows if r.user_id == 1]
    assert [(r.state, r.n_observations, r.is_current) for r in u1] == [
        ("view", 2, False), ("click", 1, False), ("view", 1, True),
    ]
    # intervals tile: each valid_to equals the next valid_from
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_scd2_intervals_tile_on_corpus(spark):
    from spotify_tracks_spark.operators.analytics import events_scd2_user_state

    rows = events_scd2_user_state(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.n_observations >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in rs) == 1 and rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state  # islands are maximal runs


def test_window_funnel_gates_on_attribution_window(spark, tmp_path):
    import datetime as dt

    from spotify_tracks_spark.operators.analytics import events_window_funnel

    d = lambda day, h=0: dt.datetime(2024, 3, day, h)  # noqa: E731
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            # user 1: click 2 days after view, purchase 3 days after click
            (1, d(1), 1, "view", 1.0, "{}"),
            (2, d(3), 1, "click", 1.0, "{}"),
            (3, d(6), 1, "purchase", 1.0, "{}"),
            # user 2: click 10 days after view -> outside the 7-day window
            (4, d(1), 2, "view", 1.0, "{}"),
            (5, d(11), 2, "click", 1.0, "{}"),
            # user 3: purchase BEFORE click -> ordered gate fails
            (6, d(1), 3, "view", 1.0, "{}"),
            (7, d(2), 3, "purchase", 1.0, "{}"),
            (8, d(3), 3, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    got = {r.step: r.n_users for r in events_window_funnel(spark, sf).collect()}
    # user 3's purchase precedes its click; its click IS within window -> counted
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_window_funnel_is_subset_of_unbounded(spark):
    from spotify_tracks_spark.operators.analytics import (
        events_funnel,
        events_window_funnel,
    )

    unbounded = {r.step: r.n_users for r in events_funnel(spark, SF_SMOKE).collect()}
    windowed = {r.step: r.n_users for r in events_window_funnel(spark, SF_SMOKE).collect()}
    assert windowed["view"] == unbounded["view"]  # step 1 has no window gate
    # NB: later steps are NOT a subset of the unbounded funnel's — the
    # unbounded form anchors on the first click EVER (a pre-view click
    # disqualifies), while the windowed form re-anchors on the first
    # in-window click after the view.  Only monotonicity is an invariant.
    assert windowed["view"] >= windowed["click"] >= windowed["purchase"] >= 0


def test_bpe_merges_planted(spark, tmp_path):
    """Hand-run BPE: corpus "aaab aaab cab".  Pair counts iterate
    (a,a)=4 → merge; (a,b)=3 → merge; (aa,ab)=2 → merge.  The first
    merge exercises the consecutive-run case ('a a a' must become
    'aa a' exactly like the reference's left-to-right greedy, which the
    double-space-gap replace reproduces)."""
    from spotify_tracks_spark.operators.llm_prep import corpus_bpe_merges

    sf = _write_docs(spark, tmp_path, [(0, "aaab cab"), (1, "aaab")])
    rows = sorted(
        corpus_bpe_merges(spark, sf, n_merges=3).collect(),
        key=lambda r: r.step,
    )
    assert [(r.step, r.lhs, r.rhs, r.merged, r.pair_freq) for r in rows] == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_bpe_encode_planted(spark, tmp_path):
    """With the 3 learned merges (aa, ab, aaab) the corpus re-encodes:
    'aaab' → 1 token, 'cab' → [c, ab] = 2 tokens."""
    from spotify_tracks_spark.operators.llm_prep import corpus_bpe_encode

    sf = _write_docs(spark, tmp_path, [(0, "aaab cab"), (1, "aaab")])
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.compression)
        for r in corpus_bpe_encode(spark, sf, n_merges=3).collect()
    }
    assert got[0] == (2, 3, 8 / 3)   # "aaab cab" = 8 chars, 3 tokens
    assert got[1] == (1, 1, 4 / 1)


def test_temperature_sample_invariants(spark):
    """alpha=1/2 schedule: the smallest language keeps everything, the
    acceptance rate decreases with language size (sqrt(n_min/n)), no
    language is upsampled, and realized shares flatten the head."""
    from spotify_tracks_spark.operators.llm_prep import corpus_temperature_sample
    from tests.conftest import SF_T2

    rows = sorted(
        corpus_temperature_sample(spark, SF_T2).collect(),
        key=lambda r: r.n_docs,
    )
    assert len(rows) >= 2
    assert rows[0].accept_rate == 1.0          # smallest keeps all
    for a, b in zip(rows, rows[1:]):
        assert b.accept_rate <= a.accept_rate  # monotone in size
    for r in rows:
        assert r.n_kept <= r.n_docs            # never upsampled
    # the head language's realized share sits below its raw share
    head = rows[-1]
    raw_share = head.n_docs / sum(r.n_docs for r in rows)
    assert head.realized_share < raw_share


def test_span_corruption_masks_reconstructibly(spark, tmp_path):
    """A 20-word doc gets exactly one 3-word span: the sentinel appears
    once in the input, the target carries sentinel + the 3 masked
    words, and input+target together reconstruct the original text."""
    from spotify_tracks_spark.operators.llm_prep import (
        SPAN_LEN,
        corpus_span_corruption,
    )

    words = [f"w{i:02d}" for i in range(20)]
    text = " ".join(words)
    spark.createDataFrame(
        [(1, text, "en", "planted", len(text)),
         (2, "tiny doc", "en", "planted", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.doc_id: r for r in corpus_span_corruption(spark, str(tmp_path)).collect()}
    r = got[1]
    assert (r.n_words, r.n_spans) == (20, 1)
    assert r.input_text.count("<extra_id_0>") == 1
    tgt = r.target_text.split(" ")
    assert tgt[0] == "<extra_id_0>" and len(tgt) == 1 + SPAN_LEN
    masked = tgt[1:]
    # the masked words are contiguous in the original
    start = words.index(masked[0])
    assert words[start : start + SPAN_LEN] == masked
    # splicing the target span back over the sentinel reconstructs
    rebuilt = r.input_text.replace("<extra_id_0>", " ".join(masked))
    assert rebuilt == text
    # a 2-word doc is too short for a span: passthrough, no masking
    r2 = got[2]
    assert r2.n_spans == 0 and r2.input_text == "tiny doc" and r2.target_text == ""


def test_source_cap_planted_and_plan(spark, tmp_path):
    """Domain cap: a 5-doc source keeps exactly cap=3 docs — the three
    HIGHEST-quality ones with rank following (quality desc, doc_id) —
    while a 2-doc source keeps both.  Plan shape: the rank<=cap filter
    must push into a WindowGroupLimit (per-partition top-k before the
    sort materializes), the at-scale contract the docstring claims."""
    from pyspark.sql import functions as F

    from spotify_tracks_spark.operators.llm_prep import corpus_source_cap

    # quality_score rises with stopword density; give src_a a gradient
    rows = []
    for i, n_stop in enumerate([0, 1, 2, 3, 4]):  # doc i has i stopwords
        text = " ".join(["the"] * n_stop + ["zzz"] * (5 - n_stop))
        rows.append((i, text, "en", "src_a"))
    rows.append((10, "the the the zzz zzz", "en", "src_b"))
    rows.append((11, "zzz zzz zzz zzz zzz", "en", "src_b"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = corpus_source_cap(spark, str(tmp_path), cap=3)
    got = {(r.source, r.doc_id): r.source_rank for r in out.collect()}
    # src_a: quality order is doc 4 > 3 > 2 (most stopwords first)
    assert got == {
        ("src_a", 4): 1,
        ("src_a", 3): 2,
        ("src_a", 2): 3,
        ("src_b", 10): 1,
        ("src_b", 11): 2,
    }
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:800]


def test_quality_sweep_planted(spark, tmp_path):
    """Three docs with hand-computable scores: all-stopword text scores
    2.0 + 1/n_tok distinct ratio; no-stopword all-distinct text scores
    1.0; a mix lands between.  The curve must hold the full grid (31
    rows), be monotonically non-increasing, retain everything at t=0,
    and step down exactly at each doc's bucket boundary."""
    from pyspark.sql import functions as F

    from spotify_tracks_spark.operators.llm_prep import corpus_quality_sweep

    rows = [
        # 4 tokens, all "the": stop=4/4, uniq=1/4 -> 2*1 + 0.25 = 2.25
        (0, "the the the the", "en", "s"),
        # 4 distinct non-stopwords: 0 + 1.0 = 1.0
        (1, "aa bb cc dd", "en", "s"),
        # 2 stop of 4, all distinct: 2*0.5 + 1.0 = 2.0
        (2, "the of aa bb", "en", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = corpus_quality_sweep(spark, str(tmp_path)).collect()
    assert len(out) == 31
    by_t = {round(r.threshold, 1): r for r in out}
    # every doc has 4 tokens -> tokens track docs * 4
    assert (by_t[0.0].docs_retained, by_t[0.0].tokens_retained) == (3, 12)
    assert by_t[0.0].docs_share == 1.0 and by_t[0.0].token_share == 1.0
    assert by_t[1.0].docs_retained == 3      # >= 1.0 keeps all three
    assert by_t[1.1].docs_retained == 2      # drops the 1.0 doc
    assert by_t[2.0].docs_retained == 2      # 2.0 and 2.25 survive
    assert by_t[2.1].docs_retained == 1      # only the 2.25 doc
    assert by_t[2.3].docs_retained == 0
    assert by_t[3.0].docs_retained == 0 and by_t[3.0].token_share == 0.0
    docs_curve = [r.docs_retained for r in out]
    assert docs_curve == sorted(docs_curve, reverse=True)
