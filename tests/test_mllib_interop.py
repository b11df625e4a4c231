"""Spark MLlib interop: the built-in BucketedRandomProjectionLSH over
the embeddings table, pinned for recall against the repo's exact
brute-force baseline (SURVEY §7.2 item 7 named it; the engine's own
LSH/IVF/PQ operators are preferred because they are oracle-checkable —
MLlib's random projections draw from a JVM RNG no SQL oracle can
reproduce, so this capability is pinned here instead)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_T2


def test_mllib_brp_lsh_recall_vs_exact(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors, VectorUDT

    from spotify_tracks_spark.operators.similarity import ann_topk_bruteforce
    from spotify_tracks_spark.sources.tables import read_table

    exact = ann_topk_bruteforce(spark, SF_T2)  # (query_id, neighbor_id, ...)
    truth = {
        (r.query_id, r.neighbor_id) for r in exact.collect()
    }
    assert truth

    to_vec = F.udf(lambda xs: Vectors.dense(xs), VectorUDT())
    emb = (
        read_table(spark, SF_T2, "embeddings")
        .select("vec_id", to_vec("embedding").alias("features"))
        .cache()
    )
    probes = emb.filter(F.col("vec_id") % 100 == 0)

    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=6,
        seed=20260814,
    ).fit(emb)
    joined = (
        model.approxSimilarityJoin(probes, emb, 10.0, distCol="dist")
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            "dist",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    got = {(r.query_id, r.neighbor_id) for r in joined.collect()}
    hits = len(truth & got)
    recall = hits / len(truth)
    # candidate-recall of the MLlib index vs exact cosine top-k: the
    # euclidean-LSH candidate set must recover most cosine neighbors
    # on these normalized-ish vectors
    assert recall >= 0.5, f"MLlib BRP-LSH candidate recall {recall:.2f}"
    emb.unpersist()
