"""Streaming sketch maintenance — a Count-Min sketch folded forward per
micro-batch.

MERGEABILITY is the whole point of keeping a sketch instead of exact
counts: two sketches over disjoint data merge by cell-wise addition, so
a stream maintains the corpus sketch by adding each micro-batch's cells
— no per-key state, state size is a CONSTANT depth×width regardless of
stream length or key cardinality.  That contrasts with the engine's
other stateful streaming ops (dedup/sessionize hold per-key state
bounded only by the watermark); the sketch is the unbounded-cardinality
answer.

The fold reuses the replay-idempotence discipline of
``streaming/incremental.py``: per-batch state snapshots named by batch
id, so an at-least-once re-delivery is detected and skipped instead of
double-added.  The drained sketch is hash-equal to the batch-computed
one (same seeded portable hash as ``events_cms_heavy_hitters``), which
is the exact-oracle contract.
"""

from __future__ import annotations

import glob
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import portable_hash60
from ..operators.events import CMS_DEPTH, CMS_WIDTH
from ..sources.tables import normalize_events_ts

N_SLICES = 4

# (session id, sf_dir) -> materialized sliced-source dir (fixture prep,
# shared per session like incremental.py's _SRC_CACHE)
_SRC_CACHE: dict[tuple, str] = {}


def _batch_cells(df: DataFrame, depth: int, width: int) -> DataFrame:
    structs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("d"),
                F.pmod(portable_hash60(F.col("user_id"), seed=j), F.lit(width)).alias(
                    "cell"
                ),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(structs).alias("s"))
        .select("s.d", "s.cell")
        .groupBy("d", "cell")
        .agg(F.count("*").alias("c"))
    )


def stream_events_cms(
    spark: SparkSession,
    sf_dir: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Maintain the user-frequency CMS over a micro-batched event stream
    (availableNow drain) and return the final (d, cell, c) cell table —
    hash-equal to the batch-built sketch.

    Each micro-batch contributes its own depth×width partial sketch;
    merge = union + cell-wise sum (associative & commutative, so batch
    composition is irrelevant).  State per batch is ≤ depth×width rows —
    CONSTANT in stream length and key cardinality."""
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_cms_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_cms_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir)] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("user_id").repartition(n_slices).write.parquet(src_path)
    schema = spark.read.parquet(src_path).schema

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = _batch_cells(batch_df, depth, width)
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        merged = (
            partial.groupBy("d", "cell").agg(F.sum("c").alias("c")).persist()
        )
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    final = spark.read.parquet(f"{base}/state_b{cur['batch']}")
    return final.select("d", "cell", F.col("c").cast("long").alias("c"))


def _batch_kmv(df: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    hashed = df.select(
        "event_type", portable_hash60(F.col("user_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
    )


def stream_events_kmv(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Maintain the per-type K-Minimum-Values distinct sketch over a
    micro-batched event stream (availableNow drain) and return the
    final registers + estimate — hash-equal to the batch-built sketch
    (``events_kmv_distinct``'s merge theorem: every global k-minimum
    hash is in its own batch's k-minimum set, so union-and-retake per
    batch is lossless however the stream slices).

    State per batch is ≤ k rows per event type — constant in stream
    length and user cardinality, the cardinality twin of the CMS
    frequency fold above, with the same snapshot-per-batch replay
    idempotence.  Output: (event_type, n_kept, kth_hash,
    est_distinct_users)."""
    from ..operators.events import KMV_K, KMV_SPACE

    if k is None:
        k = KMV_K
    final = _drain_kmv_registers(spark, sf_dir, k, n_slices, base)
    sk = final.groupBy("event_type").agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    numer = float((k - 1) * KMV_SPACE)
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(numer) / F.col("kth_hash"))
    return sk.select(
        "event_type", "n_kept", "kth_hash", est.alias("est_distinct_users")
    )


def _drain_kmv_registers(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Drain the per-type KMV register fold (union-and-retake per
    micro-batch) and return the final (event_type, h) register frame —
    the shared state both streaming sketch reports read."""
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_kmv_")
        # cache key namespaced: the CMS fold's source drops event_type,
        # this one needs it — the two must not share a materialized src
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "kmv"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_kmv_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "kmv")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("event_type", "user_id").repartition(n_slices).write.parquet(
            src_path
        )
    schema = spark.read.parquet(src_path).schema

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = _batch_kmv(batch_df, k)
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        # union-and-retake: dedup shared users across batches, keep the
        # k smallest per type — the lossless KMV merge
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy("h")
        merged = (
            partial.distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("event_type", "h")
            .persist()
        )
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.read.parquet(f"{base}/state_b{cur['batch']}")


def stream_events_kmv_set_ops(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    n_slices: int = N_SLICES,
    base: str | None = None,
    include_exact: bool = True,
) -> DataFrame:
    """Streaming fold of the theta-sketch SET OPERATIONS: drain the
    per-type KMV registers through the same lossless union-and-retake
    merge as ``stream_events_kmv``, then apply the identical pair
    intersection/union/Jaccard tail as the batch build
    (operators/events.py:_kmv_set_ops_tail) — the drained report
    hash-equals the batch ``events_kmv_set_ops`` (same oracle).

    The SKETCH math is answered from ≤ k rows of state per type without
    re-reading history; the ``exact_intersection`` column is NOT — it
    is a batch-scan validation rider (a full distinct + self-join of
    the events table) kept so sketch error is visible to the oracle at
    test SF (round-8 advice).  A deployed always-on monitor passes
    ``include_exact=False`` for the registers-only report, which truly
    never re-reads history."""
    from ..operators.events import KMV_K, _kmv_set_ops_tail

    if k is None:
        k = KMV_K
    kept = _drain_kmv_registers(spark, sf_dir, k, n_slices, base).persist()
    try:
        kept.count()
        return _kmv_set_ops_tail(spark, sf_dir, kept, k, include_exact)
    finally:
        kept.unpersist()


def stream_events_kmv_anotb(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    n_slices: int = N_SLICES,
    base: str | None = None,
    include_exact: bool = True,
) -> DataFrame:
    """Streaming fold of the theta-sketch A-NOT-B report: drain the
    per-type KMV registers (same lossless union-and-retake merge as
    ``stream_events_kmv``), then apply the identical directional-
    difference tail as the batch build
    (operators/events.py:_kmv_anotb_tail) — hash-equal to batch
    ``events_kmv_anotb`` (same oracle).  As with the set-ops fold, the
    sketch math reads ≤ k rows of state per type; the exact_* columns
    are a batch-scan validation rider — pass ``include_exact=False``
    for the registers-only always-on shape."""
    from ..operators.events import KMV_K, _kmv_anotb_tail

    if k is None:
        k = KMV_K
    kept = _drain_kmv_registers(spark, sf_dir, k, n_slices, base).persist()
    try:
        kept.count()
        return _kmv_anotb_tail(spark, sf_dir, kept, k, include_exact)
    finally:
        kept.unpersist()


def _batch_hll_registers(df: DataFrame) -> DataFrame:
    from ..operators.events import _hll_rho, HLL_W_BITS

    b = (
        df.select("event_type", portable_hash60(F.col("user_id")).alias("h"))
        .distinct()
        .select(
            "event_type",
            F.shiftright(F.col("h"), HLL_W_BITS).alias("bucket"),
            F.col("h").bitwiseAND(F.lit((1 << HLL_W_BITS) - 1)).alias("w"),
        )
    )
    return b.groupBy("event_type", "bucket").agg(
        F.max(_hll_rho(F.col("w"))).alias("m")
    )


def _drain_hll_registers(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Fold the per-type HLL registers over the micro-batched stream
    (availableNow drain) and return the final (event_type, bucket, m)
    register table.  Register-wise MAX merge is associative, commutative
    AND idempotent, so the fold is insensitive to stream slicing and
    replay — the drained registers are bit-identical to a batch build
    over the same rows.  Shared by ``stream_events_hll`` (cardinality
    estimate tail) and ``stream_events_hll_set_ops`` (pair-overlap
    tail)."""
    from ..operators.events import HLL_M  # noqa: F401  (documented contract)

    if base is None:
        base = tempfile.mkdtemp(prefix="stream_hll_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "kmv"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_hll_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "kmv")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("event_type", "user_id").repartition(n_slices).write.parquet(
            src_path
        )
    schema = spark.read.parquet(src_path).schema

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = _batch_hll_registers(batch_df)
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        merged = (
            partial.groupBy("event_type", "bucket")
            .agg(F.max("m").alias("m"))
            .persist()
        )
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.read.parquet(f"{base}/state_b{cur['batch']}")


def stream_events_hll_set_ops(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
    include_exact: bool = True,
) -> DataFrame:
    """Streaming fold of the HLL SET OPERATIONS report: drain the
    per-type HLL registers (register-wise max merge — lossless), then
    apply the identical pair union/inclusion-exclusion tail as the
    batch build (operators/events.py:_hll_set_ops_tail) — hash-equal
    to batch ``events_hll_set_ops`` (same oracle).  The sketch math
    reads ≤ 256 register rows per type; the exact_intersection column
    is a batch-scan validation rider — pass ``include_exact=False``
    for the registers-only always-on shape."""
    from ..operators.events import _hll_set_ops_tail

    reg = _drain_hll_registers(spark, sf_dir, n_slices, base).persist()
    try:
        reg.count()
        return _hll_set_ops_tail(spark, sf_dir, reg, include_exact)
    finally:
        reg.unpersist()


def stream_events_hll(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Maintain the per-type HyperLogLog registers over a micro-batched
    event stream (availableNow drain) and return the final sketch —
    hash-equal to the batch build (``events_hll_distinct``): HLL merge
    is register-wise MAX, which is associative, commutative AND
    idempotent, so the fold is insensitive to how the stream slices.

    State per batch is ≤ 256 register rows per event type — constant in
    stream length and user cardinality like the CMS/KMV folds, with the
    same snapshot-per-batch replay idempotence (for HLL the max-merge
    makes even a double-fold harmless; the snapshot discipline is kept
    for uniformity and restart recovery).  Output: (event_type,
    n_zero_regs, reg_sum_e61, est_distinct_users)."""
    from ..operators.events import HLL_EST_NUMER, HLL_M

    reg = _drain_hll_registers(spark, sf_dir, n_slices, base)
    agg = reg.groupBy("event_type").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(
                "cast(shiftleft(cast(1 as bigint), cast(61 - m as int))"
                " as decimal(38,0))"
            )
        ).alias("s_present"),
    )
    v = F.lit(HLL_M) - F.col("n_present")
    s_e61 = (
        F.col("s_present")
        + v.cast("decimal(38,0)") * F.lit(1 << 61).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    raw = F.lit(HLL_EST_NUMER) / F.col("reg_sum_e61")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (F.col("n_zero_regs") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_zero_regs")),
    ).otherwise(raw)
    return (
        agg.select(
            "event_type",
            v.cast("long").alias("n_zero_regs"),
            s_e61.cast("double").alias("reg_sum_e61"),
        )
        .withColumn("est_distinct_users", est)
    )


def _batch_bloom_words(df: DataFrame) -> DataFrame:
    from ..operators.events import BLOOM_K, BLOOM_M_BITS, BLOOM_WORD_BITS

    pos = df.select(
        F.explode(
            F.array(
                *[
                    portable_hash60(F.col("user_id"), seed=i) % BLOOM_M_BITS
                    for i in range(1, BLOOM_K + 1)
                ]
            )
        ).alias("pos")
    )
    return pos.groupBy(F.shiftright(F.col("pos"), 5).alias("word")).agg(
        F.bit_or(
            F.expr(
                f"shiftleft(cast(1 as bigint),"
                f" cast(pos % {BLOOM_WORD_BITS} as int))"
            )
        ).alias("bits")
    )


def stream_events_bloom(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Maintain a Bloom filter of every user ever seen over a
    micro-batched event stream — the streaming MEMBERSHIP index (the
    ingest-time "have we seen this key before?" structure;
    ``events_bloom_membership`` is its batch/evaluation twin).  Bitmap
    OR is associative, commutative and idempotent, so the fold is
    insensitive to slicing and replay, like the HLL register max.

    State is ≤ m/32 word rows — constant in stream length and key
    cardinality.  Output: the final (word, bits) table, hash-equal to
    a batch build over the distinct users."""
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_bloom_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "kmv"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_bloom_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "kmv")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("event_type", "user_id").repartition(n_slices).write.parquet(
            src_path
        )
    schema = spark.read.parquet(src_path).schema

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: OR is idempotent anyway
        partial = _batch_bloom_words(batch_df.select("user_id").distinct())
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        merged = (
            partial.groupBy("word").agg(F.bit_or("bits").alias("bits")).persist()
        )
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.read.parquet(f"{base}/state_b{cur['batch']}")


def stream_events_quantile_hist(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Streaming quantile-sketch maintenance: the equi-width bin vector
    of ``operators/profile.py::events_quantile_hist`` folded forward per
    micro-batch (bin vectors ADD — the mergeable-sketch property), then
    the shared cumulative-walk/interpolation at drain.  Hash-equal to
    the batch sketch (same EVENTS_QUANTILE_HIST oracle).

    The binning BOUNDS are computed from the static source before the
    stream starts and broadcast into every batch's bin assignment —
    the production contract for streaming histograms: bounds come from
    the PREVIOUS profile (yesterday's min/max), because a one-pass
    stream cannot both discover the domain and bin exactly into it.
    This is also why the truly bounds-free streaming quantile sketches
    (KLL, t-digest) are sampling- or merge-order-sensitive and thus not
    oracle-checkable; the fixed-bounds fold is the exact-contract
    member of the family.  State per batch stays ≤ |types|×n_bins rows
    — constant in stream length, like the CMS/KMV/HLL/Bloom folds.
    Replay-idempotent via the shared per-batch snapshot discipline."""
    from ..operators.profile import HIST_BINS, quantiles_from_hist

    if base is None:
        base = tempfile.mkdtemp(prefix="stream_qhist_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "qhist"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_qhist_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "qhist")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("event_type", "value").repartition(n_slices).write.parquet(
            src_path
        )
    schema = spark.read.parquet(src_path).schema

    # bounds from the static source = "the previous profile" (see
    # docstring); a |types|-row broadcast relation for every batch
    bounds = (
        spark.read.parquet(src_path)
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .localCheckpoint(eager=True)
    )

    def _batch_bins(df: DataFrame) -> DataFrame:
        j = df.join(F.broadcast(bounds), "event_type").withColumn(
            "w", (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS))
        )
        bucket = F.when(F.col("w") == 0, F.lit(0).cast("long")).otherwise(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / F.col("w")),
                F.lit(HIST_BINS - 1),
            ).cast("long")
        )
        return j.groupBy(
            "event_type", bucket.alias("bucket"), F.col("lo"), F.col("w")
        ).agg(F.count("*").alias("n"))

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = _batch_bins(batch_df)
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        merged = (
            partial.groupBy("event_type", "bucket", "lo", "w")
            .agg(F.sum("n").alias("n"))
            .persist()
        )
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    if cur["batch"] < 0:
        # Fresh base whose source yielded ZERO micro-batches: no state
        # snapshot exists, so reading state_b-1 would raise an opaque
        # AnalysisException.  Return the empty sketch with the batch
        # operator's schema instead (its empty-input behavior).
        return spark.createDataFrame(
            [], "event_type string, p double, n_total bigint, est double"
        )
    final = spark.read.parquet(f"{base}/state_b{cur['batch']}").withColumn(
        "n", F.col("n").cast("long")
    )
    return quantiles_from_hist(final)


def stream_events_sequential_ab(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Streaming maintenance of the group-sequential A/B monitor: the
    always-on form of ``operators/analytics.py::events_sequential_ab``
    — exactly the op whose POINT is to be recomputed as data arrives
    (each micro-batch advances the cumulative-conversion looks; a
    dashboard reads the drained table).  Hash-equal to the batch
    monitor (same EVENTS_SEQUENTIAL_AB oracle).

    State is TWO grains, both bounded: one row per user (grain 'u':
    arm + min-folded first-purchase day — min is associative, so the
    fold replays idempotently) and one row per observed day (grain
    'd').  Entity-grain like the incremental-mart states, never
    event-grain; per-batch snapshots give the same at-least-once
    replay detection as the other folds here.  The drain hands the
    state to the SHARED report tail (``sequential_ab_report``), so
    batch and stream produce byte-identical looks from identical
    state."""
    from ..operators.analytics import AB_SPLIT_MOD, sequential_ab_report

    if base is None:
        base = tempfile.mkdtemp(prefix="stream_seq_ab_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "seq_ab"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_seq_ab_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "seq_ab")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        normalize_events_ts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).select("user_id", "event_type", "ts").repartition(
            n_slices
        ).write.parquet(src_path)
    schema = spark.read.parquet(src_path).schema

    def _partials(df: DataFrame) -> DataFrame:
        u = df.groupBy("user_id").agg(
            F.min(
                F.when(F.col("event_type") == "purchase", F.to_date("ts"))
            ).alias("day"),
        ).select(
            F.lit("u").alias("grain"), "user_id", "day"
        )
        d = df.select(F.to_date("ts").alias("day")).distinct().select(
            F.lit("d").alias("grain"),
            F.lit(None).cast("long").alias("user_id"),
            "day",
        )
        return u.unionByName(d)

    def _remerge(u: DataFrame) -> DataFrame:
        # 'u' rows: min-fold fp_day per user (nulls stay null until the
        # first purchase arrives); 'd' rows: day IS the key, min is a
        # no-op on it
        return u.groupBy(
            "grain",
            "user_id",
            F.when(F.col("grain") == "d", F.col("day")).alias("day_key"),
        ).agg(F.min("day").alias("day")).select(
            "grain", "user_id", "day"
        )

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1, "df": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = _partials(batch_df)
        if cur["batch"] >= 0:
            prev = (
                cur["df"]
                if cur["df"] is not None
                else spark.read.parquet(f"{base}/state_b{cur['batch']}")
            )
            partial = prev.unionByName(partial)
        merged = _remerge(partial).persist()
        merged.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        if cur["df"] is not None:
            cur["df"].unpersist()
        cur["df"] = merged
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    if cur["batch"] < 0:
        return spark.createDataFrame(
            [],
            "day date, day_idx bigint, n_days bigint, n_a bigint, "
            "n_b bigint, conv_a bigint, conv_b bigint, z_stat double, "
            "obf_bound double, crosses boolean",
        )
    state = spark.read.parquet(f"{base}/state_b{cur['batch']}")
    users = state.filter(F.col("grain") == "u").select(
        F.col("day").alias("fp_day"),
        (portable_hash60(F.col("user_id")) % AB_SPLIT_MOD == 0).alias(
            "arm_a"
        ),
    )
    days = state.filter(F.col("grain") == "d").select("day")
    return sequential_ab_report(users, days)


def stream_docs_heavy_terms(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = None,
    n_slices: int = N_SLICES,
    base: str | None = None,
) -> DataFrame:
    """Streaming fold of ``text_heavy_terms_mg``: maintain a single
    k-counter MISRA-GRIES summary over the micro-batched document
    stream (availableNow drain), then run the batch operator's exact
    recount pass over the drained candidate set — same oracle as the
    batch op, because the output is the exact > n/k set either way.

    The state story is the module's: like the CMS/KMV/HLL folds the
    summary is MERGEABLE (sequential merge is the Agarwal et al. 2012
    special case), so state is ≤ k rows REGARDLESS of stream length or
    vocabulary size — the streaming answer to "top terms over an
    unbounded token stream".  Each batch folds its exact token counts
    into the summary; the compress step reads the (k+1)-th largest
    stored count off a ≤(k+1)-row bounded collect and decrements — the
    total decrement over the whole stream stays ≤ n/(k+1), so every
    globally-heavy term survives to the drain (the batch operator's
    superset guarantee, sequentially).  Replay-idempotence rides the
    module's snapshot-per-batch-id discipline."""
    from ..operators.text_analysis import MG_K, WORD_RE

    if k is None:
        k = MG_K
    if base is None:
        base = tempfile.mkdtemp(prefix="stream_mg_")
        src_path = _SRC_CACHE.get((id(spark), sf_dir, "docs"))
        if src_path is None or not os.path.isdir(src_path):
            src_path = tempfile.mkdtemp(prefix="stream_mg_src_") + "/src"
            _SRC_CACHE[(id(spark), sf_dir, "docs")] = src_path
    else:
        src_path = f"{base}/src"
    if not os.path.isdir(src_path):
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "text"
        ).repartition(n_slices).write.parquet(src_path)
    schema = spark.read.parquet(src_path).schema

    done = sorted(
        int(m.group(1))
        for p in glob.glob(f"{base}/state_b*")
        if (m := re.search(r"state_b(\d+)$", p))
    )
    cur: dict = {"batch": done[-1] if done else -1}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= cur["batch"]:
            return  # at-least-once replay: already folded
        partial = (
            batch_df.select(
                F.explode(
                    F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count("*").alias("c"))
        )
        if cur["batch"] >= 0:
            # prior state always re-read from its parquet snapshot: the
            # snapshot IS the recovery contract (restart-idempotent),
            # and a k-row read is cheaper than keeping a per-batch
            # persisted frame alive (round-10 advice: the in-memory
            # hand-off this replaced was dead code)
            prev = spark.read.parquet(f"{base}/state_b{cur['batch']}")
            partial = prev.unionByName(partial)
        merged = partial.groupBy("tok").agg(F.sum("c").alias("c")).persist()
        # MG compress: the (k+1)-th largest stored count off a bounded
        # (k+1)-row collect; subtract it everywhere, drop the dead
        top = merged.orderBy(F.desc("c"), F.asc("tok")).limit(k + 1).collect()
        if len(top) > k:
            m = int(top[-1].c)
            state = merged.select(
                "tok", (F.col("c") - m).alias("c")
            ).filter(F.col("c") > 0)
        else:
            state = merged
        state.write.mode("overwrite").parquet(f"{base}/state_b{batch_id}")
        merged.unpersist()
        cur["batch"] = batch_id

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_path)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)

    cands = spark.read.parquet(f"{base}/state_b{cur['batch']}").select("tok")
    # exact recount over the full corpus — the batch operator's pass 2
    from ..sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
        ).alias("tok")
    )
    n_total = docs.agg(
        F.sum(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0))
        ).cast("long").alias("n_total")
    )
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("freq") * k > F.col("n_total"))
        .select(
            F.col("tok").alias("token"),
            "freq",
            "n_total",
            F.round(F.col("freq") / F.col("n_total"), 6).alias("share"),
        )
    )
