"""Deterministic smoke-scale fixture generator for CI / portable runs.

The engine's tests read parquet fixtures from ``$SPARK_GRAFT_DATA_ROOT``
(default ``/root/testdata``, the driver-generated set — see TESTDATA.md).
On machines without that set (e.g. a GitHub-hosted runner for the docs
workflow), this script synthesizes schema-identical tables with the same
broad shape: a TPC-H-ish star schema with referential integrity, an
``events`` stream with a zipf-ish user mix, a ``documents`` corpus with
PLANTED exact clones and near-duplicates (so the dedup families find
real pairs), and clustered ``embeddings`` (so ANN/kmeans have structure).

Row counts scale linearly in sf from the observed sf0.001 base.  The
content is NOT byte-identical to the driver set — every test compares
Spark against the DuckDB oracle on the SAME files, so any deterministic
data satisfies the harness.

Usage: python scripts/gen_testdata.py [ROOT] [SF ...]
       (defaults: ROOT=./testdata, SF = 0.001 0.01)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "the a spark group query row data slow small filter customer line batch "
    "value merge table scan join order stream window dup hash agg part sort "
    "key big fast column vector"
).split()

# Document-text vocabulary (round-10 verdict item 2): the 31-word VOCAB
# above made every pair of documents share most of their shingle sets, so
# set-similarity candidate generation was near-quadratic BY FIXTURE
# CONSTRUCTION and the prefix-filter/BPE families could not be
# curve-tested above sf0.1.  Documents now draw from a Zipf(s≈1.07)
# rank-frequency law (the empirical natural-language shape) over a
# vocabulary that GROWS with corpus size per Heaps' law (V = K·T^β,
# K=30, β=0.5 — mid-range empirical constants): a first Zipf rewrite
# with a FIXED 10^4-type vocabulary still read superlinear for the
# prefix-filter families at sf0.2+, because a fixed type inventory
# makes every shingle's document frequency grow linearly with the
# corpus — the rare tokens prefix filtering anchors on stop existing.
# Real corpora mint new types as they grow; modeling that is what makes
# df-ranked selectivity (and therefore the set-similarity scale curves)
# meaningful above sf0.1.
MIN_DOC_VOCAB = 10_000
HEAPS_K = 30.0
HEAPS_BETA = 0.5
#: expected words per document under the lognormal(4.0, 0.8) clipped
#: length draw (used to size the vocabulary before generation)
_MEAN_DOC_WORDS = 75
ZIPF_S = 1.07


def _doc_vocab_size(n_doc: int) -> int:
    """Heaps' law type inventory for the expected token count."""
    tokens = n_doc * _MEAN_DOC_WORDS
    return max(MIN_DOC_VOCAB, int(HEAPS_K * tokens**HEAPS_BETA))


def _doc_vocab(size: int) -> list[str]:
    """Deterministic vocabulary: word i spelled as 4–9 hash-derived
    lowercase letters.  The spelling ALPHABET matters as much as the
    type count: a first cut spelled words from 20 fixed syllables, and
    even with Heaps-scaled types the 8-char SHINGLE space saturated
    (~600 k prefix tokens at 250 k docs), making every shingle's df grow
    linearly and the measured prefix-filter candidate mass quadratic
    (4.2–4.6× per corpus doubling, max prefix-df 16).  Hash-letter
    spelling mimics real orthography — character n-gram diversity grows
    with the vocabulary — and the same measurement reads max prefix-df
    2–3 with ~200× fewer candidates at 40 k docs."""
    import hashlib
    import string

    letters = string.ascii_lowercase
    words = []
    for i in range(size):
        h = hashlib.md5(str(i).encode()).hexdigest()
        n = 4 + (i * 2654435761 >> 7) % 6
        words.append(
            "".join(letters[int(h[j * 2 : j * 2 + 2], 16) % 26] for j in range(n))
        )
    return words


def _zipf_pmf(v: int, s: float) -> np.ndarray:
    ranks = np.arange(1, v + 1, dtype="float64")
    p = ranks ** -s
    return p / p.sum()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDEAST"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "en", "de", "fr", "es", "zh"]  # en-heavy like the driver set
EPOCH_US = np.datetime64("2024-01-01", "us").astype("int64")
# order/ship dates follow the driver set's classic TPC-H 1995-2001 span
TPCH_EPOCH_US = np.datetime64("1995-01-01", "us").astype("int64")
MONTH_US = 30 * 24 * 3600 * 1_000_000


def _ts(us: np.ndarray) -> pa.Array:
    return pa.array((EPOCH_US + us).astype("datetime64[us]"))


def _tpch_ts(us: np.ndarray) -> pa.Array:
    return pa.array((TPCH_EPOCH_US + us).astype("datetime64[us]"))


def gen_sf(root: str, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    scale = sf / 0.001
    out = os.path.join(root, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_supp = max(10, int(10 * scale))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))

    n_cust = int(150 * scale)
    write("customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], n_cust
        ),
    }))

    n_part = int(200 * scale)
    write("part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [f"part {i} {VOCAB[i % len(VOCAB)]}" for i in range(1, n_part + 1)],
        "p_brand": [f"Brand#{i % 5 + 1}{i % 3 + 1}" for i in range(n_part)],
        "p_type": rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY"], n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))

    n_ord = int(1500 * scale)
    o_key = np.arange(1, n_ord + 1, dtype="int64")
    write("orders", pa.table({
        "o_orderkey": o_key,
        "o_custkey": rng.integers(1, n_cust + 1, n_ord),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord, p=[0.48, 0.48, 0.04]),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        # whole-second instants: the staging key renders these via
        # cast-to-string in Spark vs %H:%M:%S strftime in the oracle —
        # both agree only when the fractional part is zero (the driver
        # set's convention)
        "o_orderdate": _tpch_ts(rng.integers(0, 84 * MONTH_US // 1_000_000, n_ord) * 1_000_000),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord
        ),
    }))

    n_li = int(6000 * scale)
    li_order = np.sort(rng.integers(1, n_ord + 1, n_li))
    linenum = np.ones(n_li, dtype="int32")
    for i in range(1, n_li):
        if li_order[i] == li_order[i - 1]:
            linenum[i] = linenum[i - 1] + 1
    write("lineitem", pa.table({
        "l_orderkey": li_order,
        "l_partkey": rng.integers(1, n_part + 1, n_li),
        "l_suppkey": rng.integers(1, n_supp + 1, n_li),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": _tpch_ts(rng.integers(0, 84 * MONTH_US // 1_000_000, n_li) * 1_000_000),
    }))

    n_ev = int(1000 * scale)
    n_users = max(15, int(15 * scale))
    write("events", pa.table({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": _ts(np.sort(rng.integers(0, MONTH_US, n_ev))),
        "user_id": rng.zipf(1.5, n_ev) % n_users,  # skewed mix, like real traffic
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(rng.uniform(0, 200, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    n_doc = int(500 * scale)
    vocab_size = _doc_vocab_size(n_doc)
    doc_vocab = _doc_vocab(vocab_size)
    doc_pmf = _zipf_pmf(vocab_size, ZIPF_S)

    def _draw_words(n: int) -> list[str]:
        return [doc_vocab[j] for j in rng.choice(vocab_size, n, p=doc_pmf)]

    texts: list[str] = []
    for i in range(n_doc):
        if i >= 20 and rng.random() < 0.05:  # exact clone of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i >= 20 and rng.random() < 0.05:  # near-dup: a few word edits
            words = texts[rng.integers(0, i)].split()
            for _ in range(max(1, len(words) // 30)):
                words[rng.integers(0, len(words))] = _draw_words(1)[0]
            texts.append(" ".join(words))
        else:
            # log-normal doc lengths (median ~55 words, tail to 1000) —
            # the realistic size mix the old uniform 20-100 lacked
            n_words = int(np.clip(rng.lognormal(4.0, 0.8), 15, 1000))
            texts.append(" ".join(_draw_words(n_words)))
    write("documents", pa.table({
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))

    n_emb, dim, k = int(500 * scale), 64, 8
    centers = rng.normal(0, 1, (k, dim))
    label = rng.integers(0, k, n_emb)
    vecs = (centers[label] + rng.normal(0, 0.4, (n_emb, dim))).astype("float32")
    write("embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    }))
    print(f"wrote sf{sf:g} fixtures to {out}")


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "./testdata"
    sfs = [float(s) for s in sys.argv[2:]] or [0.001, 0.01]
    for sf in sfs:
        gen_sf(root, sf)


if __name__ == "__main__":
    main()
