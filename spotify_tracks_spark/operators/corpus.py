"""End-to-end corpus preparation — the composition a training-data
pipeline actually runs over raw documents, as ONE Spark plan:

    language gate  →  quality gate  →  exact dedup  →  deterministic sample

Each stage reuses the engine's standalone operators' semantics
(text_langid, text_quality, dedup_exact, hash-mod sampling) but composes
them as column expressions over a single scan: the three per-doc signals
(language scores, quality ratios, content fingerprint) are one narrow
projection, so the whole pipeline costs one documents scan + one groupBy
shuffle on the fingerprint (the dedup), and the filters run scan-side.

Scale shape: this is the canonical 100 TB corpus-cleaning job. The gates
drop most rows BEFORE the only shuffle, so the exchange moves just the
(fp, doc_id) projection of surviving docs; everything else is
whole-stage-codegen projections. A production run would write the kept
doc_ids as the training manifest.

Oracle: oracles_ext.CORPUS_PREP mirrors every stage in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import portable_hash60
from ..sources.tables import read_table
from .text_analysis import LANG_STOPWORDS

CORPUS_LANG = "en"
CORPUS_MIN_TOKENS = 10
CORPUS_MIN_QUALITY = 0.5
CORPUS_SAMPLE_PCT = 80


def _signals(docs: DataFrame) -> DataFrame:
    """The shared per-doc signal projection (language argmax with the
    text_langid declaration-order tie-break, quality ratios, content
    fingerprint) — one narrow scan-side projection used identically by
    corpus_prep and corpus_survival, so the two stay expression-equal."""
    toks = F.split(F.lower(F.col("text")), " ")
    n_tok = F.size(toks)
    all_stop = tuple(w for ws in LANG_STOPWORDS.values() for w in ws)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    n_uniq = F.size(F.array_distinct(toks))
    quality = (n_stop / n_tok) * 2.0 + (n_uniq / n_tok)

    def _score(ws: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = {lg: _score(ws) for lg, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lg in scores:
        pred = pred.when(scores[lg] == best, F.lit(lg))

    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        n_tok.cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
        fp.alias("fp"),
    )


def corpus_prep(
    spark: SparkSession,
    sf_dir: str,
    lang: str = CORPUS_LANG,
    min_tokens: int = CORPUS_MIN_TOKENS,
    min_quality: float = CORPUS_MIN_QUALITY,
    sample_pct: int = CORPUS_SAMPLE_PCT,
) -> DataFrame:
    """Docs surviving the full cleaning pipeline, with their signals.

    Output: (doc_id, lang_pred, n_tokens, quality_score, fp) — one row per
    kept document (predicted ``lang``, ≥ ``min_tokens`` tokens, quality ≥
    ``min_quality``, canonical member of its exact-dup group, in the
    ``sample_pct``% deterministic sample keyed on doc_id)."""
    gated = _signals(read_table(spark, sf_dir, "documents", spread=True)).filter(
        (F.col("lang_pred") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
    )

    # exact dedup among survivors: keep the min-doc_id member per
    # fingerprint (dedup AFTER the gates — cheaper, and a doc whose dup was
    # quality-rejected must still survive, which dedup-then-gate would get
    # wrong the other way around; this order is the contract)
    canon = gated.groupBy("fp").agg(F.min("doc_id").alias("canonical_doc_id"))
    kept = (
        gated.join(canon, "fp")
        .filter(F.col("doc_id") == F.col("canonical_doc_id"))
        .drop("canonical_doc_id")
    )

    # deterministic sample, consistent with every other hash-mod sampler
    bucket = F.pmod(portable_hash60(F.col("doc_id").cast("string")), F.lit(100))
    return kept.filter(bucket < sample_pct).select(
        "doc_id", "lang_pred", "n_tokens", "quality_score", "fp"
    )


SURVIVAL_STAGES = ("lang", "min_tokens", "quality", "exact_dup", "sample")


def corpus_survival(
    spark: SparkSession,
    sf_dir: str,
    lang: str = CORPUS_LANG,
    min_tokens: int = CORPUS_MIN_TOKENS,
    min_quality: float = CORPUS_MIN_QUALITY,
    sample_pct: int = CORPUS_SAMPLE_PCT,
) -> DataFrame:
    """Corpus-cleaning SURVIVAL FUNNEL — the per-gate attrition report
    for the exact pipeline ``corpus_prep`` materializes: every document
    is attributed to the FIRST gate that drops it (gate order is the
    pipeline order, so the numbers are the funnel a data-quality
    dashboard shows beside the cleaned corpus), then one tiny cumulative
    pass turns per-gate drop counts into in/out chains.

    Shares ``_signals`` with corpus_prep (expression-equal by
    construction) and the same dedup-after-gates contract: the canonical
    member per fingerprint is chosen among gate-survivors only.  Cost:
    the corpus_prep scan + shuffle, plus a 5-row window.

    Output: (stage_no, stage, n_in, n_dropped, n_out), 5 rows chained
    (n_out of the last stage = the kept-corpus size)."""
    labeled = _signals(read_table(spark, sf_dir, "documents", spread=True))
    lang_ok = F.col("lang_pred") == lang
    tok_ok = F.col("n_tokens") >= min_tokens
    q_ok = F.col("quality_score") >= min_quality
    pass3 = labeled.filter(lang_ok & tok_ok & q_ok)
    canon = pass3.groupBy("fp").agg(F.min("doc_id").alias("canonical_doc_id"))
    # canon is one row per surviving FINGERPRINT — corpus-scale, the same
    # cardinality corpus_prep joins as a plain shuffle join.  No broadcast
    # hint: at 100 TB a forced broadcast of a corpus-sized side would blow
    # the broadcast limit / OOM the driver; a shuffle join on fp is the
    # correct shape (AQE still downgrades it to broadcast when tiny).
    with_canon = labeled.join(canon, "fp", "left")
    bucket = F.pmod(portable_hash60(F.col("doc_id").cast("string")), F.lit(100))
    stage = (
        F.when(~lang_ok, "lang")
        .when(~tok_ok, "min_tokens")
        .when(~q_ok, "quality")
        .when(F.col("doc_id") != F.col("canonical_doc_id"), "exact_dup")
        .when(bucket >= sample_pct, "sample")
        .otherwise("kept")
    )
    counts = with_canon.select(stage.alias("stage")).groupBy("stage").agg(
        F.count("*").alias("n")
    )
    stages = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(SURVIVAL_STAGES)],
        "stage_no long, stage string",
    )
    total = counts.agg(F.sum("n").alias("n_total"))
    w = Window.orderBy("stage_no").rowsBetween(Window.unboundedPreceding, -1)
    funnel = (
        stages.join(counts, "stage", "left")
        .withColumn("n_dropped", F.coalesce("n", F.lit(0)).cast("long"))
        .join(F.broadcast(total))
        .withColumn(
            "n_in",
            (F.col("n_total") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0)))
            .cast("long"),
        )
    )
    return funnel.select(
        "stage_no",
        "stage",
        "n_in",
        "n_dropped",
        (F.col("n_in") - F.col("n_dropped")).cast("long").alias("n_out"),
    )


def corpus_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-token inflation report — the single number that
    motivates the whole dedup stage: what fraction of the corpus's
    training tokens are exact-duplicate copies (tokens a model would see
    again verbatim)?  Per exact-dup group every non-canonical member's
    tokens count as inflation.

    One scan projecting (fp, n_tokens), one group-key shuffle for the
    canonical map, one global aggregate — integer sums throughout, one
    final division.  Output: single row (n_docs, n_dup_docs,
    total_tokens, dup_tokens, dup_token_frac)."""
    from .dedup import _norm

    d = read_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id",
        F.md5(_norm(F.col("text"))).alias("fp"),
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("nt"),
    )
    canon = d.groupBy("fp").agg(F.min("doc_id").alias("canonical_doc_id"))
    j = d.join(canon, "fp").withColumn(
        "is_dup", F.col("doc_id") != F.col("canonical_doc_id")
    )
    return j.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long").alias("n_dup_docs"),
        F.sum("nt").alias("total_tokens"),
        F.sum(F.when(F.col("is_dup"), F.col("nt")).otherwise(0)).cast("long").alias("dup_tokens"),
    ).select(
        "n_docs",
        "n_dup_docs",
        "total_tokens",
        "dup_tokens",
        (F.col("dup_tokens") / F.col("total_tokens")).alias("dup_token_frac"),
    )
