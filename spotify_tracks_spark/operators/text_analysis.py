"""Text-analysis operators over the ``documents`` table — the quality/
filtering stage of a large-scale training-data pipeline.

Every operator here is a *pure narrow projection*: per-row Column
expressions (higher-order functions over token arrays), no UDFs, no
shuffles.  At 100 TB these run at parquet-scan speed, fully inside
whole-stage codegen, and scale linearly with executors — the ideal shape
for corpus-wide quality scoring.  Each has a byte-exact DuckDB oracle
(oracles_ext.py).

Float determinism: every ratio is a single IEEE division of two exact
integers — bit-identical across engines and partitionings (no float
aggregation anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import portable_hash60
from ..sources.tables import read_table

WORD_RE = "[a-z0-9]+"
# BPE-ish pretokenizer (GPT-2 family): contraction suffixes, space-prefixed
# letter runs, short digit runs, punctuation runs, whitespace runs.  Both
# Java regex and DuckDB's RE2 use leftmost-first alternation, so the token
# stream — and therefore the count — is identical across engines.
BPE_RE = r"'(?:s|t|ll|ve|re|d|m)| ?[a-z]+| ?[0-9]{1,3}| ?[^\sa-z0-9']+|\s+"

# Tiny per-language stopword lists for the n-gram/stopword lang-id heuristic.
# Order matters: ties resolve to the first listed language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "fr": ("le", "la", "de", "et", "que", "des", "un"),
}


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens + a BPE-ish
    pretokenizer count (the per-doc budget estimate an LLM-data pipeline
    filters and packs on) + chars."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)).cast("long").alias("n_word_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0)).cast("long").alias("n_bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/uniqueness signals.

    ``quality_score`` is a deterministic single-expression combination —
    the filter threshold a corpus-cleaning pass would apply."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = _tokens(F.lower(F.col("text")))
    n_tok = F.size(toks)
    all_stop = tuple(w for ws in LANG_STOPWORDS.values() for w in ws)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    n_uniq = F.size(F.array_distinct(toks))
    sum_tok_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (sum_tok_len / n_tok).alias("mean_token_len"),
        (n_stop / n_tok).alias("stopword_ratio"),
        (n_uniq / n_tok).alias("distinct_ratio"),
        ((n_stop / n_tok) * 2.0 + (n_uniq / n_tok)).alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (n-gram heuristic family).

    Argmax over per-language stopword hit counts; deterministic tie-break
    by declaration order; 'und' when nothing matches."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = _tokens(F.lower(F.col("text")))
    # NB: the lambda must be unary — pyspark passes (element, index) to
    # two-parameter lambdas, so a `ws=ws` default would capture the index.
    def _score(ws: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = {lang: _score(ws) for lang, ws in LANG_STOPWORDS.items()}
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first language reaching the max wins
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = docs.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )
    return out


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact hash + min-shingle (winnowing-lite).

    ``fp_exact``: md5 of the whitespace-normalized lowercase text (exact-dup
    key).  ``fp_min_shingle``: min portable hash over all 8-char shingles —
    one shared shingle ⇒ same fingerprint candidate bucket (the single-hash
    blocking used by dedup_ngram).  Computed per-row via
    sequence+transform+array_min: no explode, no shuffle."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    k = 8
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
        lambda g: portable_hash60(norm.substr(g, F.lit(k))),
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_exact"),
        F.array_min(shingle_hashes).alias("fp_min_shingle"),
    )


TFIDF_TOP_K = 3


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic corpus-statistics
    join: a per-(doc, term) frequency table joined against the corpus-wide
    document-frequency table.

    Plan shape: one explode of whitespace tokens → groupBy (doc_id, term)
    [the only fact-scale shuffle], persisted so the document-frequency
    aggregate (|vocab| rows — tiny) and the scoring join read one
    materialization → df broadcast back → per-doc top-k window with a
    total-order tie-break (tfidf desc, term asc).  At 100 TB the df table is still vocab-sized,
    so the enrich step is a map-side hash probe; only the initial
    tokenize/count touches the log at scale.

    Floats: idf = ln((N+1)/(df+1)) + 1 and tf = n/len are each a single
    IEEE expression over exact integers — libm ln agrees with DuckDB well
    inside the harness's 6-dp float canonicalization."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    n_docs = docs.count()  # one scalar; the corpus size is a plan constant
    toks = docs.select(
        "doc_id",
        F.size(_tokens(F.lower(F.col("text")))).alias("n_tokens"),
        F.explode(_tokens(F.lower(F.col("text")))).alias("term"),
    )
    # persist-and-pin (the dedup.py pattern): both consumers — the df
    # aggregate and the scored join — read one materialization instead of
    # re-running the explode+count lineage (column pruning otherwise
    # specializes the two subplans past ReuseExchange's reach; at 100 TB
    # this intermediate would be a written table)
    per_doc_term = (
        toks.groupBy("doc_id", "n_tokens", "term")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    per_doc_term.count()
    df_tbl = per_doc_term.groupBy("term").agg(
        F.count("*").alias("df")
    )
    idf = F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = per_doc_term.join(F.broadcast(df_tbl), "term").select(
        "doc_id",
        "term",
        (F.col("n") / F.col("n_tokens")).alias("tf"),
        idf.alias("idf"),
        ((F.col("n") / F.col("n_tokens")) * idf).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "idf", "tfidf", "rnk")
    )


DOCSIM_MAX_DF = 200   # posting-list cap: terms in more docs are dropped
DOCSIM_TOP_K = 3


def text_doc_similarity(
    spark: SparkSession,
    sf_dir: str,
    k: int = DOCSIM_TOP_K,
    max_df: int = DOCSIM_MAX_DF,
) -> DataFrame:
    """Per-document top-``k`` lexically similar documents by term-count
    cosine over an INVERTED-INDEX join — the lexical-side mirror of the
    embedding ANN family (same candidate-then-verify scale shape, no
    all-pairs comparison anywhere).

    Similarity space: the df-capped vocabulary.  Terms appearing in more
    than ``max(max_df, n_docs/10)`` documents are dropped BEFORE the
    posting-list self-join — the stopword cap that bounds candidate
    fan-out at Σ_term df² over kept terms (a corpus-frequent term
    otherwise joins quadratically, the classic posting-list skew bomb);
    vectors and norms are defined over the kept terms, so the metric is
    exactly "cosine over discriminative vocabulary".  The corpus-
    relative component keeps the cap meaningful across scales (a pure
    absolute cap empties the space once every term's df outgrows it);
    production would tune both knobs per corpus.

    Exactness: term counts are integers, so the pairwise dot product and
    squared norms are INTEGER sums (order-independent — no IEEE
    reassociation hazard); cosine is one sqrt+division per side in both
    engines, hash-identical.  Ranking ties break (cos desc, neighbor_id
    asc).

    Plan: explode→count [the one fact-scale shuffle], persisted; df
    table (vocab-sized) broadcast back for the cap filter; posting-list
    self-join on term; pair-grain partial-agg shuffle; norm join at
    entity grain.  Output: (doc_id, neighbor_id, shared_terms, dot,
    cos, rnk) — each doc's k nearest lexical neighbors."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    counts = (
        docs.select(
            "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    counts.count()  # pin one computation before df-agg + self-join fan-out
    # corpus size for the relative cap, derived from the ALREADY-PERSISTED
    # counts table (docs with ≥1 token — the population the similarity
    # space is defined over) instead of a second full documents scan
    n_docs = counts.agg(F.countDistinct("doc_id")).collect()[0][0]
    cap = max(max_df, n_docs // 10)  # one scalar; a plan constant
    df_keep = (
        counts.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= cap)
        .select("term")
    )
    kept = counts.join(F.broadcast(df_keep), "term").persist()
    kept.count()
    norms = kept.groupBy("doc_id").agg(
        F.sum(F.col("n") * F.col("n")).alias("nsq")
    )
    a = kept.select("term", "doc_id", F.col("n").alias("na"))
    b = kept.select(
        "term", F.col("doc_id").alias("neighbor_id"), F.col("n").alias("nb")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_id") != F.col("neighbor_id"))
        .groupBy("doc_id", "neighbor_id")
        .agg(
            F.count("*").alias("shared_terms"),
            F.sum(F.col("na") * F.col("nb")).alias("dot"),
        )
    )
    scored = (
        pairs.join(norms.withColumnRenamed("nsq", "nsq_a"), "doc_id")
        .join(
            norms.select(
                F.col("doc_id").alias("neighbor_id"), F.col("nsq").alias("nsq_b")
            ),
            "neighbor_id",
        )
        .select(
            "doc_id",
            "neighbor_id",
            "shared_terms",
            "dot",
            (F.col("dot") / (F.sqrt("nsq_a") * F.sqrt("nsq_b"))).alias("cos"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            "neighbor_id",
            "shared_terms",
            "dot",
            F.round("cos", 6).alias("cos"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


LM_ALPHA = 1.0  # add-one smoothing


def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model scoring: fit bigram frequencies on
    the whole corpus, then score every document's mean log-likelihood
    under that model — the statistical fluency gate (cheap perplexity)
    corpus-cleaning pipelines run where a neural LM would be overkill.

    Broadcast-model pattern: the corpus-wide (prev_char, char) count
    table — at most |alphabet|² rows after lowercasing, a few thousand —
    aggregates in one explode+groupBy pass, broadcasts, and the scoring
    pass re-joins each document's bigrams against it map-side; the only
    full-data shuffles carry (bigram, count) pairs and per-doc partial
    sums.  Add-one smoothing keeps unseen bigrams finite.  Both engines
    evaluate the identical ln() sum over identical integer counts, so
    the score is oracle-comparable at 6 dp.

    Output: (doc_id, n_bigrams, mean_loglik)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    norm = F.lower(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - 1, F.lit(1))),
        lambda i: norm.substr(i, F.lit(2)),
    )
    ex = docs.select("doc_id", F.explode(grams).alias("g"))
    counts = ex.groupBy("g").agg(F.count("*").alias("n_g")).persist()
    counts.count()
    total = counts.agg(F.sum("n_g").alias("n_total"))
    vocab = counts.agg(F.count("*").alias("n_vocab"))
    scored = (
        ex.join(F.broadcast(counts), "g", "left")
        .join(F.broadcast(total))
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce("n_g", F.lit(0)) + F.lit(LM_ALPHA))
                / (F.col("n_total") + F.lit(LM_ALPHA) * F.col("n_vocab"))
            ).alias("ll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("ll") / F.count("*")).alias("mean_loglik"),
    )


def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: predicted vs labeled language with
    per-cell counts and per-label recall — the evaluation report that
    decides whether the n-gram classifier's quality clears the corpus
    gate (the langid operator alone says WHAT it predicts; this says how
    often it's right, per language).

    Composes ``text_langid`` and folds to (lang, lang_pred) grain — one
    tiny aggregate on top of the zero-shuffle scorer, plus a broadcast
    per-label total for recall.  Output: (lang, lang_pred, n, recall) —
    recall is the label's diagonal share, repeated on each of its rows
    (diagonal row: n/total for that label)."""
    pred = text_langid(spark, sf_dir).select("doc_id", "lang", "lang_pred")
    cells = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    totals = cells.groupBy("lang").agg(F.sum("n").alias("n_label"))
    diag = (
        cells.filter(F.col("lang") == F.col("lang_pred"))
        .select("lang", F.col("n").alias("n_correct"))
    )
    return (
        cells.join(F.broadcast(totals), "lang")
        .join(F.broadcast(diag), "lang", "left")
        .select(
            "lang",
            "lang_pred",
            "n",
            (F.coalesce("n_correct", F.lit(0)) / F.col("n_label")).alias("recall"),
        )
    )


def documents_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by (source, lang): document counts, token
    volume, and each cell's share of its source — the mixture report a
    training-data curator reads before setting sampling weights (and the
    input to the per-source up/down-weighting step).

    One scan, one tiny aggregate; shares computed from exact integer
    counts against a broadcast per-source total.

    Output: (source, lang, n_docs, n_tokens, doc_share)."""
    docs = read_table(spark, sf_dir, "documents", spread=True).select(
        "source", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    cell = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    per_source = cell.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    return cell.join(F.broadcast(per_source), "source").select(
        "source",
        "lang",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_docs") / F.col("src_docs")).alias("doc_share"),
    )


WILSON_Z = 1.96                 # 95% two-sided normal quantile (literal)


def source_quality_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality leaderboard with a WILSON 95% lower bound —
    the ranking a data-curation pass actually sorts by: a source with
    3/3 passing docs must NOT outrank one with 900/1000, which a raw
    pass-rate does and the Wilson lower confidence bound corrects
    (small n drags the bound toward zero).

    pass = the corpus gate's own criterion (quality_score ≥
    CORPUS_MIN_QUALITY, operators/corpus.py).  The bound
    (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n) is built from
    counts, literals, one sqrt and divisions — every operation either
    exact or IEEE-correctly-rounded (sqrt included), so the oracle is
    tolerance-free like the temperature sampler's thresholds.

    Scale shape: the quality signals are scan-side projections; one
    |sources|-row aggregate.  Output: (source, n_docs, n_pass,
    pass_rate, wilson_lower)."""
    from .text_analysis import text_quality  # self-import safe at runtime

    from ..operators.corpus import CORPUS_MIN_QUALITY

    docs = read_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "source"
    )
    q = text_quality(spark, sf_dir).select(
        "doc_id", (F.col("quality_score") >= CORPUS_MIN_QUALITY).alias("ok")
    )
    agg = (
        docs.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_pass"),
        )
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_pass") / n
    z = F.lit(WILSON_Z)
    z2 = z * z
    lower = (p + z2 / (2 * n) - z * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (
        1 + z2 / n
    )
    return agg.select(
        "source",
        "n_docs",
        "n_pass",
        p.alias("pass_rate"),
        lower.alias("wilson_lower"),
    )


BM25_K1 = 1.2                   # literals of the standard Robertson form
BM25_B = 0.75
BM25_N_QUERY_TERMS = 3          # query = top-df non-stopword terms


def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring — the ranking function a RAG data-prep
    pipeline runs over its corpus (TF-IDF's operator sibling upgraded
    with the saturation (k1) and length-normalization (b) terms that
    made BM25 the lexical-retrieval standard).

    The query is data-derived deterministically: the top
    ``BM25_N_QUERY_TERMS`` corpus terms by document frequency,
    stopwords excluded, total tie-break (df desc, term asc) — integer
    selection, no float boundary.  Scored set = every doc containing
    ≥ 1 query term — an integer-exact membership condition, so the row
    SET is deterministic and no float-ordered LIMIT can flip rows
    between engines (the idf ln() only perturbs decimals, which the
    6-dp rounding absorbs; a top-k would let a 1-ulp ln difference
    swap the k-th row).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln((N−df+0.5)/(df+0.5) + 1).

    Scale shape: df and tf come from one token-keyed aggregate each
    (the tf one pre-filtered to the 3 query terms — a broadcast
    semi-probe); dl is a scan-side projection; avgdl one scalar.
    Output: (doc_id, n_query_terms_hit, dl, score)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("t")
    )
    toks = toks.persist()
    try:
        all_stop = tuple(w for ws in LANG_STOPWORDS.values() for w in ws)
        df_tbl = (
            toks.distinct()
            .groupBy("t")
            .agg(F.count("*").alias("df"))
        )
        n_docs = docs.count()
        query = (
            df_tbl.filter(~F.col("t").isin(*all_stop))
            .orderBy(F.desc("df"), F.asc("t"))
            .limit(BM25_N_QUERY_TERMS)
        )
        dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        avgdl = dl.agg(
            (F.sum("dl") / F.count("*")).alias("avgdl")
        )
        tf = (
            toks.join(F.broadcast(query.select("t", "df")), "t")
            .groupBy("doc_id", "t", "df")
            .agg(F.count("*").alias("tf"))
        )
        idf = F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        denom = F.col("tf") + F.lit(BM25_K1) * (
            F.lit(1.0)
            - F.lit(BM25_B)
            + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
        )
        term_score = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom
        return (
            tf.join(dl, "doc_id")
            .crossJoin(F.broadcast(avgdl))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_query_terms_hit"),
                F.max("dl").alias("dl"),
                F.sum(term_score).alias("score"),
            )
        )
    finally:
        toks.unpersist()


def text_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language identification: multinomial Naive Bayes over
    character bigrams, fit on the corpus's own labels and evaluated as
    a confusion matrix — the learned counterpart to the heuristic
    ``text_langid`` (fixed marker n-grams): same task, opposite
    regime, and the pair shows the engine running a full train+predict
    loop as two DataFrame passes.

    Model: P(lang) = docs_l/N; P(g|lang) = (n_gl + 1)/(T_l + V)
    (add-one smoothing over the corpus-wide bigram vocabulary V).
    Prediction: argmax_lang [ln P(lang) + Σ_g c_g·ln P(g|lang)],
    with the Σ over the DOC's distinct bigrams weighted by their
    in-doc counts c_g, so scoring joins the (per-doc distinct-gram)
    table — not the raw gram stream — against the model.

    Determinism: all model counts are exact integers; the per-(doc,
    lang) score is a sum of ln() terms (the text_bigram_lm_score
    precedent — summation-order noise sits ~6 orders under the 6-dp
    hash), and the argmax tie-breaks on the LARGEST lang string via
    one max-of-struct (no sort, no window) — mirrored by the oracle's
    (score desc, lang desc) ordering.

    Scale shape: the model is |langs|×|bigrams| rows (a few thousand)
    built in one pass and BROADCAST; scoring is the per-doc gram table
    fanned out |langs|× and re-aggregated to (doc, lang) then doc
    grain — linear in corpus size, model never shuffles.

    Output: (lang_actual, lang_pred, n_docs), the confusion matrix."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    norm = F.lower(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - 1, F.lit(1))),
        lambda i: norm.substr(i, F.lit(2)),
    )
    doc_grams = (
        docs.select("doc_id", "lang", F.explode(grams).alias("g"))
        .groupBy("doc_id", "lang", "g")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    # pinned (round-11): the per-doc distinct-gram table feeds BOTH the
    # model aggregate and the scoring fan-out — unpinned, the corpus-wide
    # bigram explode + aggregate (the dominant scan) ran twice
    doc_grams.count()
    # --- train: per-(lang, gram) counts, per-lang totals, priors, vocab
    model = doc_grams.groupBy(F.col("lang").alias("ml"), "g").agg(
        F.sum("c").alias("n_gl")
    ).persist()
    model.count()
    lang_tot = model.groupBy("ml").agg(F.sum("n_gl").alias("t_l"))
    priors = docs.groupBy(F.col("lang").alias("ml")).agg(
        F.count("*").alias("docs_l")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    vocab = model.select("g").distinct().agg(F.count("*").alias("v"))
    langs = (
        priors.join(F.broadcast(lang_tot), "ml")
        .join(F.broadcast(vocab))
        .join(F.broadcast(n_docs))
    )
    # --- predict: fan each doc's gram table out across the langs spine,
    # left-join the model (unseen (g, lang) smooths to ln(1/(T_l+V)))
    scored = (
        doc_grams.crossJoin(F.broadcast(langs))
        .join(F.broadcast(model), ["ml", "g"], "left")
        .select(
            "doc_id",
            "lang",
            "ml",
            F.log(F.col("docs_l") / F.col("n_docs")).alias("prior_ll"),
            (
                F.col("c")
                * F.log(
                    (F.coalesce("n_gl", F.lit(0)) + F.lit(1.0))
                    / (F.col("t_l") + F.col("v"))
                )
            ).alias("ll"),
        )
    )
    per_lang = scored.groupBy("doc_id", "lang", "ml").agg(
        (F.first("prior_ll") + F.sum("ll")).alias("score")
    )
    # argmax via max-of-struct; an exact score tie (continuous floats —
    # effectively impossible) resolves to the LARGEST lang string, and
    # the oracle orders (score desc, lang desc) to match
    picked = per_lang.groupBy("doc_id", "lang").agg(
        F.max(
            F.struct(F.col("score"), F.col("ml").alias("lang_pred"))
        ).alias("m")
    )
    out = picked.select(
        F.col("lang").alias("lang_actual"), F.col("m.lang_pred").alias("lang_pred")
    )
    result = out.groupBy("lang_actual", "lang_pred").agg(
        F.count("*").alias("n_docs")
    ).localCheckpoint(eager=True)
    model.unpersist()
    doc_grams.unpersist()
    return result


# Flesch reading-ease heuristics, pinned for the oracle twin: sentences
# are terminator RUNS (an unterminated trailing sentence folds into the
# max(1, ·) floor), words are the WORD_RE runs the token counter already
# uses, syllables are vowel-group runs — the classic dictionary-free
# approximation (one group per syllable nucleus).
SENT_RE = "[.!?]+"
SYLL_RE = "[aeiouy]+"


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READABILITY scoring: per-document Flesch reading ease
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    (Flesch, "A new readability yardstick", J. Applied Psychology 1948)
    — next to ``text_quality``'s structural signals, the corpus-curation
    filter that targets PROSE COMPLEXITY: training mixes routinely gate
    or re-weight on a readability band, and the score needs only three
    regex counts, so it runs at full scan speed with no model artifact.

    Plan: one narrow projection over the documents scan — three
    ``regexp_extract_all`` counts (JVM-side, whole-stage codegen; the
    same machinery as ``text_tokens``) and one fixed-order float
    expression.  Zero joins, zero shuffles, column-pruned to (doc_id,
    lang, text).

    Determinism: all three counts are exact integers; the score applies
    a FIXED sequence of IEEE ops (two divisions of exact integers, two
    multiplies, two subtractions, left-associated) that the oracle
    mirrors literally; 6-dp rounded.  Docs with zero words are excluded
    in both engines rather than scored on a guard value.

    Output: (doc_id, lang, n_words, n_sentences, n_syllables, flesch)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    words = F.size(F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0))
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all("text", F.lit(SENT_RE), 0))
    )
    syll = F.size(F.regexp_extract_all(F.lower("text"), F.lit(SYLL_RE), 0))
    return (
        docs.select(
            "doc_id",
            "lang",
            words.cast("long").alias("n_words"),
            sents.cast("long").alias("n_sentences"),
            syll.cast("long").alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "lang",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
                - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
                6,
            ).alias("flesch"),
        )
    )


# Misra-Gries summary size per PARTITION for the heavy-terms report.
# The report threshold is freq > n/MG_K; a k-counter MG summary's
# decrement total is <= n_p/(k+1) per partition, so every globally-heavy
# term survives at least one partition summary (averaging argument) and
# the exact recount pass makes the final set independent of MG internals.
MG_K = 64


def text_heavy_terms_mg(
    spark: SparkSession, sf_dir: str, k: int = MG_K
) -> DataFrame:
    """HEAVY HITTERS over the corpus token stream via distributed
    MISRA-GRIES: the exact set of word tokens with frequency > n/k,
    computed WITHOUT shuffling the full token vocabulary — the classic
    two-pass deterministic heavy-hitter scheme (Misra & Gries, "Finding
    repeated elements", 1982; mergeable-summary form per Agarwal et al.,
    PODS 2012).  The corpus-curation use is stopword/boilerplate-term
    discovery on a token stream whose vocabulary is too large to
    groupBy at 100 TB.

    Plan: pass 1 is a ``mapInPandas`` over the exploded token stream
    keeping a k-counter MG summary PER PARTITION (Arrow-batched; each
    batch folds via ``value_counts`` then one compress step) — each
    partition emits <= k candidate rows plus one NULL-token sentinel
    carrying the partition token count, so the global total n rides the
    same single pass.  Pass 2 recounts ONLY the <= k·P candidate tokens
    via a broadcast semi-join on the token stream and keeps
    ``freq·k > n`` — an exact integer comparison, so the output set is
    precisely the > n/k terms, independent of partitioning and of the
    summary's decrement history.  Only candidate rows ever shuffle.

    Determinism: the MG superset guarantee makes pass 2's output exact;
    freq and n are exact integers; the share is one 6-dp-rounded IEEE
    division.

    Output: (token, freq, n_total, share) for tokens with
    freq·k > n_total."""
    import pandas as pd

    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
        ).alias("tok")
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for tok, c in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # compress: subtract the (k+1)-th largest stored count
                # from every counter, drop the non-positive — the
                # mergeable-summaries step whose total decrement per
                # partition is bounded by n_p/(k+1)
                m = sorted(counters.values(), reverse=True)[k]
                counters = {
                    t: c - m for t, c in counters.items() if c - m > 0
                }
        out = pd.DataFrame(
            {"tok": list(counters) + [None], "cnt": list(counters.values()) + [n_part]}
        )
        yield out

    summary = toks.mapInPandas(mg_partition, "tok string, cnt long")
    summary = summary.localCheckpoint(eager=True)  # one MG pass feeds both reads
    n_total = summary.filter(F.col("tok").isNull()).agg(
        F.sum("cnt").alias("n_total")
    )
    cands = summary.filter(F.col("tok").isNotNull()).select("tok").distinct()
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


RAKE_TOP_K = 3


def rake_stopword_re() -> str:
    """The phrase-delimiter regex RAKE splits on: every stopword the
    repo's lang-id heuristic knows, word-bounded.  Shared verbatim with
    the oracle (a diverging list would silently re-segment phrases)."""
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    return r"\b(?:" + "|".join(all_stop) + r")\b"


def text_rake_phrases(
    spark: SparkSession, sf_dir: str, k: int = RAKE_TOP_K
) -> DataFrame:
    """KEYWORD EXTRACTION via RAKE (Rose et al., "Automatic keyword
    extraction from individual documents", 2010): candidate phrases are
    maximal runs of non-stopword tokens between punctuation/stopword
    delimiters; each word scores deg/freq over the whole corpus (deg =
    Σ length of phrases containing it — co-occurrence reach; freq =
    occurrence count) and a phrase scores the sum of its word scores —
    multi-word domain terms outrank common single words, with no model
    artifact and one scan.  The corpus-curation use is boilerplate/
    topic-term surfacing next to ``text_tfidf_top_terms`` (which ranks
    single tokens by rarity; RAKE ranks PHRASES by cohesion).

    Plan: segmentation is three JVM-side regex rewrites + one explode
    (scan speed, column-pruned); word stats are one token-grain
    aggregate; phrase scoring joins candidates to the |vocab|-row score
    table and re-aggregates at (doc, phrase) grain; the per-doc top-k
    window is partitioned by doc_id.  Nothing unbounded, no Python.

    Determinism: freq/deg are exact integers; each word score is one
    IEEE division; the per-phrase sum's order noise sits far below the
    6-dp rounding; ties break on the phrase string.

    Output: (doc_id, phrase, n_words, score, phrase_rank) — top-k
    phrases per document."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    norm = F.regexp_replace(F.lower("text"), r"\s+", " ")
    seg = F.regexp_replace(norm, "[^a-z0-9 ]+", "|")
    seg = F.regexp_replace(seg, rake_stopword_re(), "|")
    phrases = (
        docs.select("doc_id", F.explode(F.split(seg, r"\|")).alias("ph0"))
        .select("doc_id", F.trim("ph0").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    inst_words = phrases.select(
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wstats = inst_words.groupBy("word").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    cand = phrases.distinct()
    cw = cand.select(
        "doc_id", "phrase", F.explode(F.split("phrase", " ")).alias("word")
    )
    scored = (
        cw.join(wstats, "word")
        .groupBy("doc_id", "phrase")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.col("deg") / F.col("freq")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        scored.withColumn("phrase_rank", F.row_number().over(w))
        .filter(F.col("phrase_rank") <= k)
        .select(
            "doc_id",
            "phrase",
            "n_words",
            F.round("score", 6).alias("score"),
            F.col("phrase_rank").cast("long").alias("phrase_rank"),
        )
    )


ZIPF_TOP_TERMS = 256


def text_zipf_slope(
    spark: SparkSession, sf_dir: str, top_terms: int = ZIPF_TOP_TERMS
) -> DataFrame:
    """ZIPF-LAW fit of the corpus token distribution: OLS slope of
    ln(freq) on ln(rank) over the ``top_terms`` most frequent word
    tokens — the one-number "is this corpus natural-language-shaped"
    diagnostic (natural text slopes ≈ −1; boilerplate-heavy or
    synthetic corpora flatten or steepen), the companion corpus-level
    check to the per-doc quality scores.

    Plan: one token-grain aggregate, a TakeOrderedAndProject for the
    bounded top-``top_terms`` slice ((freq desc, token) total order),
    rank assignment on that ≤256-row frame (the global window is
    bounded by the limit BELOW it — lint rule 1's benign shape), and a
    one-row moment fold.  The vocabulary never sorts globally.

    Determinism: frequencies are exact integers; ln is libm-correctly-
    rounded on exact operands in both engines; the ≤256-term moment
    sums carry ulp noise far below the 6-dp rounding; the OLS closed
    form applies a fixed IEEE op order the oracle mirrors.

    Output: one row (n_terms, slope, intercept, r2)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
        ).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(top_terms)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    xy = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r_num = n * sxy - sx * sy
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (r_num * r_num) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("r2"),
    )


def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEXICAL-DIVERSITY profile per language: type-token ratio and the
    hapax-legomena share — the corpus-health pair next to
    ``text_zipf_slope``: synthetic or template-heavy text collapses TTR
    and starves the hapax tail long before it fails per-doc quality
    gates (classic corpus linguistics diagnostics).

    Plan: one token-grain aggregate at (lang, token) then a |langs|-row
    fold — two small shuffles after map-side combine, scan-side column
    pruning to (lang, text).

    Determinism: all counts exact integers; the two ratios are single
    IEEE divisions, 6-dp rounded.

    Output: (lang, n_tokens, n_types, n_hapax, type_token_ratio,
    hapax_share)."""
    docs = read_table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)
        ).alias("tok"),
    )
    per_type = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    return per_type.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("type_token_ratio"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("hapax_share"),
    )
