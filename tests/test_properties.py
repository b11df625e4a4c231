"""Property-based tests (hypothesis) for the expression kernel and the
idempotent sink — the helpers every downstream hash depends on.

Each property generates a batch of rows and runs ONE Spark job over the
whole batch (per-example Spark round-trips would be prohibitively slow),
comparing against an independent pure-Python reference implementation.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spotify_tracks_spark.config import SK_NULL_SENTINEL
from spotify_tracks_spark.functions import portable_hash60, safe_divide, surrogate_key

# printable unicode without surrogates; Spark/Python agree on utf-8 for these
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=40,
)
MAYBE_TEXT = st.one_of(st.none(), TEXT)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sk_reference(a: str | None, b: str | None) -> str:
    """dbt_utils.generate_surrogate_key reference (dbt-utils 1.2.0)."""
    pa = a if a is not None else SK_NULL_SENTINEL
    pb = b if b is not None else SK_NULL_SENTINEL
    return hashlib.md5(f"{pa}-{pb}".encode()).hexdigest()


@given(rows=st.lists(st.tuples(MAYBE_TEXT, MAYBE_TEXT), min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_surrogate_key_matches_reference_md5(spark, rows):
    df = spark.createDataFrame(rows, "a: string, b: string")
    got = [r.k for r in df.select(surrogate_key("a", "b").alias("k")).collect()]
    want = [_sk_reference(a, b) for a, b in rows]
    assert sorted(got) == sorted(want)


@given(rows=st.lists(TEXT, min_size=1, max_size=25))
@settings(**_SETTINGS)
def test_portable_hash60_matches_reference(spark, rows):
    df = spark.createDataFrame([(s,) for s in rows], "s: string")
    got = {r.s: r.h for r in df.select("s", portable_hash60(F.col("s")).alias("h")).collect()}
    for s in rows:
        assert got[s] == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(
    rows=st.lists(
        st.tuples(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.one_of(st.just(0.0), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_safe_divide_null_on_zero(spark, rows):
    df = spark.createDataFrame(rows, "n: double, d: double")
    out = df.select("n", "d", safe_divide(F.col("n"), F.col("d")).alias("q")).collect()
    for r in out:
        if r.d == 0.0:
            assert r.q is None
        else:
            assert r.q == r.n / r.d


@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    overlap=st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=40),
)
@settings(**_SETTINGS)
def test_idempotent_append_property(spark, keys, overlap):
    """Appending ANY overlap of already-present keys inserts only the truly
    new ones, and re-appending is always a no-op (ON CONFLICT DO NOTHING)."""
    from spotify_tracks_spark.operators.idempotent_sink import (
        append_if_absent,
        idempotent_union,
    )

    existing = spark.createDataFrame([(k, f"v{k}") for k in set(keys)], "k: long, v: string")
    incoming = spark.createDataFrame(
        [(k, f"w{k}") for k in set(overlap)] or [(None, None)], "k: long, v: string"
    ).filter(F.col("k").isNotNull())

    fresh = append_if_absent(existing, incoming, ["k"])
    assert {r.k for r in fresh.collect()} == set(overlap) - set(keys)
    after = idempotent_union(existing, incoming, ["k"])
    assert after.count() == len(set(keys) | set(overlap))
    assert append_if_absent(after, incoming, ["k"]).count() == 0


@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    capacity=st.integers(min_value=4, max_value=64),
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_serial_replay(spark, tmp_path_factory, counts, capacity):
    """Distributed two-level prefix-sum packing == a serial Python replay
    of concat-then-chunk, for arbitrary doc sizes and capacities."""
    from spotify_tracks_spark.operators.llm_prep import corpus_pack_sequences

    tmp = tmp_path_factory.mktemp("pack")
    rows = [(i, " ".join(["w"] * n), "en", "syn", n) for i, n in enumerate(counts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{tmp}/documents.parquet")

    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in corpus_pack_sequences(spark, str(tmp), capacity=capacity).collect()
    }
    cum = 0
    for i, n in enumerate(counts):
        assert got[i] == (cum // capacity, cum % capacity), (i, n, capacity)
        cum += n


_EVENT_TYPES3 = ("click", "purchase", "view")


def _events_dir(spark, tmp_path_factory, events):
    """Write a synthetic events table shaped like a testdata sf_dir.
    ``events`` = [(user_id, ts_offset_s, event_type, value)]."""
    import datetime

    tmp = tmp_path_factory.mktemp("ev")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=off), u, t, v, "{}")
        for i, (u, off, t, v) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{tmp}/events.parquet")
    return str(tmp), rows


EV = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=10_000),
        st.sampled_from(_EVENT_TYPES3),
        st.floats(min_value=0.01, max_value=100, allow_nan=False),
    ),
    min_size=2,
    max_size=40,
)


@given(events=EV)
@settings(**_SETTINGS)
def test_markov_matches_brute_force(spark, tmp_path_factory, events):
    """Distributed lead-window transition counts == a serial per-user
    replay, for arbitrary interleavings and duplicate timestamps."""
    from collections import Counter, defaultdict

    from spotify_tracks_spark.operators.analytics import events_markov_transitions

    sf, rows = _events_dir(spark, tmp_path_factory, events)
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p)
        for r in events_markov_transitions(spark, sf).collect()
    }
    seqs = defaultdict(list)
    for eid, ts, u, t, v, _ in rows:
        seqs[u].append((ts, eid, t))
    pairs = Counter()
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in pairs.items():
        row_tot[a] += n
    assert set(got) == set(pairs)
    for k, n in pairs.items():
        gn, gp = got[k]
        assert gn == n
        assert abs(gp - n / row_tot[k[0]]) < 1e-12


@given(events=EV)
@settings(**_SETTINGS)
def test_pit_join_matches_brute_force(spark, tmp_path_factory, events):
    """PIT lookup == serial replay: for each purchase, the state of the
    run in effect immediately before it (NULL for a user's first event)."""
    from collections import defaultdict

    from spotify_tracks_spark.operators.analytics import events_pit_join

    sf, rows = _events_dir(spark, tmp_path_factory, events)
    got = {
        r.event_id: (r.prior_state, r.prior_state_from)
        for r in events_pit_join(spark, sf).collect()
    }
    seqs = defaultdict(list)
    for eid, ts, u, t, v, _ in rows:
        seqs[u].append((ts, eid, t))
    want = {}
    for u, evs in seqs.items():
        evs.sort()
        # SCD2 runs: (state, valid_from, valid_to)
        runs = []
        for ts, eid, t in evs:
            if not runs or runs[-1][0] != t:
                runs.append([t, ts, None])
        for prev, nxt in zip(runs, runs[1:]):
            prev[2] = nxt[1]
        for ts, eid, t in evs:
            if t != "purchase":
                continue
            hit = None
            for state, vf, vt in runs:
                if vf < ts and (vt is None or vt >= ts):
                    hit = (state, vf)
            want[eid] = hit if hit else (None, None)
    assert got == want


@given(events=EV)
@settings(**_SETTINGS)
def test_weighted_sample_matches_brute_force(spark, tmp_path_factory, events):
    """A-ES top-k == serial scoring with the same portable hash."""
    import hashlib
    import math

    from spotify_tracks_spark.operators.analytics import (
        WSAMPLE_RES,
        events_weighted_sample,
    )

    sf, rows = _events_dir(spark, tmp_path_factory, events)
    k = 10
    got = [r.event_id for r in events_weighted_sample(spark, sf, k=k).collect()]
    scored = []
    for eid, ts, u, t, v, _ in rows:
        h = int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16)
        key = math.log((h % WSAMPLE_RES + 0.5) / WSAMPLE_RES) / v
        scored.append((-key, eid))
    want = [eid for _, eid in sorted(scored)[:k]]
    assert got == want
