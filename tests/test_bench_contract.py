"""Artifact-contract test for bench.py's output shapes (no Spark).

Round 3's full-surface JSON line overflowed the driver's stdout
tail-capture window (BENCH_r03.json: parsed null).  The contract since
round 4: the printed line carries ONLY the driver-surface queries and
must stay compact no matter how large the benched surface grows."""

from __future__ import annotations

import json

from bench import build_outputs


def test_compact_line_bounded_and_full_record_complete():
    # simulate a surface far larger than today's (500 extras + 50 driver)
    obs = {f"extra_query_with_a_long_name_{i:03d}": [1.234, 1.111] for i in range(500)}
    driver = {f"driver_query_{i:02d}": [2.5, 2.0, 1.987] for i in range(50)}
    obs.update(driver)
    errors = {"broken_one": "SomeError: boom"}

    full, out, name = build_outputs(
        obs, errors, sf=0.1, startup_s=28.81, driver_names=set(driver), round_no=4
    )
    line = json.dumps(out)
    # the driver's tail window held ~50-query lines fine in rounds 1-2;
    # 4 kB leaves heavy margin and fails loudly if someone re-inlines the
    # full surface into the printed line
    assert len(line) < 4096, len(line)
    assert set(out["queries"]) == set(driver)
    assert out["n_queries_total"] == 550
    assert out["full_map"] == name == "BENCH_FULL_r04.json"
    assert out["n_errors"] == 1

    # full record keeps everything: per-query min + raw per-pass times
    assert set(full["queries"]) == set(obs)
    assert full["queries"]["driver_query_00"] == 1.987  # min-of-3
    assert full["passes"]["driver_query_00"] == [2.5, 2.0, 1.987]
    assert full["errors"] == errors
    # totals agree between the two records (modulo display rounding)
    assert abs(full["value"] - out["value"]) < 0.01


def test_every_registered_query_has_a_baseline_anchor():
    """The 2x perf contract reads BASELINE.md's consolidated anchor
    table — a query registered without an anchor row silently escapes
    the contract, so pin full coverage here (streaming-family entries
    that share a bench key with their batch twin are resolved via the
    same-name rule bench.py uses)."""
    import os
    import re

    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    anchors = set()
    for line in open(os.path.join(root, "BASELINE.md")):
        m = re.match(r"\| (\w+) \| [\d.]+ \|", line)
        if m:
            anchors.add(m.group(1))
    registered = set(entrymod.queries()) | set(entrymod.extra_queries())
    missing = sorted(registered - anchors)
    assert not missing, f"queries with no BASELINE anchor row: {missing}"


def test_carrier_tracker_attributes_first_family_member():
    """The carriers key (round-8 verdict item 6): the first query that
    populates a shared-artifact memo is recorded as that family's
    carrier, later family members are not, and build_outputs surfaces
    the per-pass list in the full record."""
    from bench import CarrierTracker, build_outputs

    edge_memo: dict = {}
    shingle_memo: dict = {}
    tracker = CarrierTracker(
        {"copurchase_edges": edge_memo, "dedup_shingles": shingle_memo}
    )
    tracker.observe("events_summary")  # touches neither family
    assert tracker.carriers == {}
    edge_memo[(1, "sf", 40)] = object()  # pagerank built the shared edges
    tracker.observe("parts_copurchase_pagerank")
    tracker.observe("parts_copurchase_triangles")  # reuses, must NOT carry
    shingle_memo[(1, "sf")] = object()
    tracker.observe("dedup_jaccard_exact_join")
    assert tracker.carriers == {
        "copurchase_edges": "parts_copurchase_pagerank",
        "dedup_shingles": "dedup_jaccard_exact_join",
    }

    full, _out, _name = build_outputs(
        {"q": [1.0]}, {}, sf=0.1, startup_s=1.0, driver_names={"q"},
        round_no=9, carriers=[tracker.carriers, tracker.carriers],
    )
    assert full["carriers"] == [tracker.carriers, tracker.carriers]


def test_memo_probes_resolve_real_memos():
    """_memo_probes must keep pointing at the live module-level memo
    dicts — a rename there would silently blind the carrier report."""
    from bench import _memo_probes
    from spotify_tracks_spark.operators import graph as _g

    probes = _memo_probes()
    assert set(probes) == {
        "model_chain",
        "copurchase_edges",
        "copurchase_triangles",
        "copurchase_lpa",
        "dedup_shingles",
        "dedup_minhash_pairs",
        "dedup_simhash_pairs",
        "dedup_ngram_pairs",
        "dedup_edit_pairs",
        "ann_exact_baseline",
        "ann_topk_lists",
        "bpe_artifacts",
    }
    assert probes["copurchase_edges"] is _g._EDGE_MEMO
    assert probes["copurchase_triangles"] is _g._TRI_MEMO
    assert probes["copurchase_lpa"] is _g._LPA_MEMO
