"""Corpus-statistics document weighting for training-data curation:
TF-IDF term extraction, DSIR importance weights, and CCNet-style
perplexity bucketing.

These extend the reference's per-document quality scoring family
(reference review_analysis.py:498-540 computes per-doc token/n-gram
statistics; analyzers/quality.py scores docs against corpus-level
vocabulary) with the three corpus-weighting schemes a large-scale
training-data pipeline runs between cleaning and sampling:

- TF-IDF top terms (Salton & Buckley 1988; sklearn's smooth-idf
  variant): surfaces each document's most characteristic terms.
- DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): per-document log importance weight
  log p_target(x) - log p_raw(x) under hashed n-gram unigram/bigram
  bag models of a target domain vs the raw corpus.
- CCNet perplexity buckets (Wenzek et al. 2020): score each doc under
  a per-language corpus LM and cut into head/middle/tail buckets at
  the 1/3 and 2/3 cumulative-mass points of the per-language score
  distribution (CCNet buckets by value cuts computed from the corpus,
  which is what makes this deterministic and shuffle-light).

Scale notes (10^12 rows): every stage is hash-aggregate or
aggregate-then-broadcast shaped. The only potentially skewed shuffle is
the tf JOIN df-by-term join in TF-IDF (stop-word terms appear in ~every
doc); the build side there is 1 row per term, exactly the shape AQE
skew-join splitting handles (left partitions split, tiny right
replicated) — a window-over-term alternative would put the whole hot
term in ONE task with no AQE rescue, so the join is deliberate.
Perplexity cuts are computed on the (lang, nll_4dp) aggregate — at most
a few 10^4 distinct rounded scores per language — so the cut windows
never see corpus-sized partitions.

Float discipline (cross-engine parity with the DuckDB oracles): every
per-doc sum of logs goes through the repo-standard order-independent
pattern — round(term, 6) -> exact decimal(28,10) sum -> double ->
(+1e-9) round(4) — and idf/log-ratio factors are computed in one fixed
operation order from integer counts, so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reviews_quality_check_spark.functions.text import tokens, word_ngrams

# DSIR hashed-feature space size (Xie et al. use 10k buckets for the
# hashed n-gram model; 1024 keeps the planted-fixture collision math
# easy to eyeball while exercising the identical shape).
DSIR_BUCKETS = 1024


def _md5_bucket(term: Column, buckets: int) -> Column:
    """md5-derived feature bucket in [0, buckets) — same closed form on
    both engines (DuckDB: ('0x'||substr(md5(t),1,8))::bigint % buckets),
    so the hashed model is cross-engine reproducible (xxhash64 is not)."""
    return F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long") % buckets


def sql_md5_bucket(term: str, buckets: int) -> str:
    return f"(('0x' || substr(md5({term}), 1, 8))::bigint % {buckets})"


def _round6_decimal_sum(col: Column) -> Column:
    return F.sum(F.round(col, 6).cast("decimal(28,10)")).cast("double")


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = raw term count in the doc; idf = ln((N+1)/(df+1)) + 1 (the
    sklearn smooth_idf form — never zero, never divides by zero); score
    = tf * idf. Ties broken by term ASC so ranking is total.

    Input: (doc_id, text). Output: (doc_id, rk, term, tfidf) with rk in
    1..k, tfidf rounded to 6dp for display (ranking uses the raw
    double, which is bit-identical cross-engine: integer counts, one
    division, one ln, one multiply in fixed order).
    """
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # one row per (doc, term) -> count(*) per term IS the doc frequency
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")  # AQE skew-split handles hot stop-word terms
        .crossJoin(F.broadcast(n))
        .withColumn(
            "s",
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("n") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "rk", "term", F.round("s", 6).alias("tfidf"))
        .orderBy("doc_id", "rk")
    )


def sql_tfidf_top_terms(docs_sql: str, token_re: str, k: int = 3) -> str:
    """DuckDB twin of tfidf_top_terms over a (doc_id, text) relation."""
    return f"""
    WITH docs AS ({docs_sql}),
    tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{token_re}')) AS term
      FROM docs),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM docs),
    scored AS (
      SELECT doc_id, term,
             cast(tf AS double) *
               (ln(cast(n + 1 AS double) / cast(df + 1 AS double)) + 1.0) AS s
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, s,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rk
      FROM scored)
    SELECT doc_id, rk, term, round(s, 6) AS tfidf
    FROM ranked WHERE rk <= {k}
    ORDER BY doc_id, rk
    """


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def dsir_log_weights(
    docs: DataFrame, target_source: str, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-document DSIR log importance weight under hashed
    unigram+bigram bag models (Xie et al. 2023 §2.2).

    Features: word unigrams and bigrams, md5-hashed into ``buckets``
    cells. Target model = docs with source == target_source; raw model
    = all docs. Both are Laplace-smoothed bucket categoricals:
    p(b) = (count_b + 1) / (total + buckets). The doc weight is
    sum over its feature OCCURRENCES of ln(p_t(b)) - ln(p_r(b)).

    Output: (doc_id, n_feats, log_weight) — log_weight through the
    order-independent round6/decimal/round4 pipeline. Docs with zero
    features score 0.0 with n_feats = 0.

    Scale: the bucket model is <= ``buckets`` rows (broadcast); the doc
    pass is explode -> broadcast-join -> doc_id hash-aggregate. No
    corpus-sized shuffle other than the doc_id aggregate itself.
    """
    from reviews_quality_check_spark.operators.pinning import pin

    tok = docs.select("doc_id", "source", tokens("text").alias("toks"))
    feats = tok.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(F.col("toks"), word_ngrams(F.col("toks"), 2))
        ).alias("feat"),
    ).select("doc_id", "source", _md5_bucket(F.col("feat"), buckets).alias("bucket"))
    # feats feeds BOTH the bucket model and the per-doc scoring join;
    # pinned (per-invocation localCheckpoint) so tokenize+bigrams+md5
    # run once instead of twice — the narrow (doc_id, source, bucket)
    # rows were already shuffled twice, now computed once (r6; same
    # rationale as dup_ngram_spans' occ pin).
    feats = pin(feats, None)
    # bucket models: raw = all docs, target = target_source docs
    model = feats.groupBy("bucket").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(
            F.when(F.col("source") == target_source, 1).otherwise(0)
        ).alias("tgt_cnt"),
    )
    totals = model.agg(
        F.sum("raw_cnt").alias("raw_total"), F.sum("tgt_cnt").alias("tgt_total")
    )
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("tgt_cnt") + F.lit(1)).cast("double")
                    / (F.col("tgt_total") + F.lit(buckets)).cast("double")
                )
                - F.log(
                    (F.col("raw_cnt") + F.lit(1)).cast("double")
                    / (F.col("raw_total") + F.lit(buckets)).cast("double")
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(_round6_decimal_sum(F.col("lr")) + F.lit(1e-9), 4).alias(
                "log_weight"
            ),
        )
    )
    base = docs.select("doc_id")
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


def sql_dsir_log_weights(
    docs_sql: str, token_re: str, target_source: str, buckets: int = DSIR_BUCKETS
) -> str:
    bucket = sql_md5_bucket("feat", buckets)
    return f"""
    WITH docs AS ({docs_sql}),
    tok AS (
      SELECT doc_id, source, regexp_extract_all(lower(text), '{token_re}') AS toks
      FROM docs),
    feats AS (
      SELECT doc_id, source, {bucket} AS bucket
      FROM (
        SELECT doc_id, source, unnest(toks) AS feat FROM tok
        UNION ALL
        SELECT doc_id, source,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 1, 0) + 1),
                 i -> toks[i] || ' ' || toks[i + 1])) AS feat
        FROM tok)),
    model AS (
      SELECT bucket, count(*) AS raw_cnt,
             sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) AS tgt_cnt
      FROM feats GROUP BY bucket),
    totals AS (
      SELECT sum(raw_cnt) AS raw_total, sum(tgt_cnt) AS tgt_total FROM model),
    lr AS (
      SELECT bucket,
             ln(cast(tgt_cnt + 1 AS double) / cast(tgt_total + {buckets} AS double))
           - ln(cast(raw_cnt + 1 AS double) / cast(raw_total + {buckets} AS double))
               AS lr
      FROM model CROSS JOIN totals),
    per_doc AS (
      SELECT doc_id, count(*) AS n_feats,
             round(cast(sum(cast(round(lr, 6) AS decimal(28,10))) AS double)
                   + 1e-9, 4) AS log_weight
      FROM feats JOIN lr USING (bucket)
      GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_feats, 0) AS n_feats,
           coalesce(p.log_weight, 0.0) AS log_weight
    FROM docs d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets
# ---------------------------------------------------------------------------

def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """Per-language unigram-LM scoring + head/middle/tail bucketing
    (Wenzek et al. 2020 §4.3, with the corpus itself as the LM corpus
    so the whole thing is deterministic and self-contained).

    LM: per-language Laplace-smoothed word unigrams over the corpus,
    ln p(w | lang) = ln((cnt + 1) / (total + V)) with V = per-language
    distinct vocabulary. Per-doc score nll = -mean ln p over the doc's
    token occurrences (round6/decimal/round4 pipeline), i.e. ln of the
    per-token perplexity. Buckets: within each language, cut the nll
    distribution at the 1/3 and 2/3 cumulative-document-count points
    computed over the (lang, nll) VALUE aggregate — head = nll <=
    cut1, middle <= cut2, tail above. Value-based cuts (all ties on a
    cut value fall in one bucket) keep the cut computation on the tiny
    aggregate instead of ranking the corpus.

    Output: (doc_id, lang, nll, ppl_bucket). Zero-token docs are
    excluded (no LM evidence).
    """
    from reviews_quality_check_spark.operators.pinning import pin

    # tok feeds the LM aggregate AND the per-doc scoring join; per_doc
    # feeds the distribution aggregate, the per-language count, and the
    # final bucket join (3 references). Both pinned per-invocation so the
    # tokenize/explode and the tok x logp join run once each (r6).
    tok = pin(
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("w")), None
    )
    lm = tok.groupBy("lang", "w").agg(F.count("*").alias("cnt"))
    lang_tot = lm.groupBy("lang").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("v")
    )
    # lang_tot is |langs| rows — broadcast, else the vocab-sized lm
    # table shuffles on the handful-of-distinct-values lang key
    logp = (
        lm.join(F.broadcast(lang_tot), "lang")
        .select(
            "lang",
            "w",
            F.log(
                (F.col("cnt") + F.lit(1)).cast("double")
                / (F.col("total") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    per_doc = pin(
        tok.join(logp, ["lang", "w"])
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                -_round6_decimal_sum(F.col("lp")) / F.count("*") + F.lit(1e-9), 4
            ).alias("nll")
        ),
        None,
    )
    # distribution aggregate: one row per distinct (lang, nll_4dp)
    dist = per_doc.groupBy("lang", "nll").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("nll")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_lang = per_doc.groupBy("lang").agg(F.count("*").alias("n"))
    cum = dist.withColumn("cum", F.sum("c").over(wcum)).join(
        F.broadcast(n_lang), "lang"
    )
    cuts = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("nll"))).alias("cut1"),
        F.min(F.when(F.col("cum") * 3 >= F.col("n") * 2, F.col("nll"))).alias(
            "cut2"
        ),
    )
    return (
        per_doc.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "nll",
            F.when(F.col("nll") <= F.col("cut1"), F.lit("head"))
            .when(F.col("nll") <= F.col("cut2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


def sql_perplexity_buckets(docs_sql: str, token_re: str) -> str:
    return f"""
    WITH docs AS ({docs_sql}),
    tok AS (
      SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '{token_re}')) AS w
      FROM docs),
    lm AS (SELECT lang, w, count(*) AS cnt FROM tok GROUP BY lang, w),
    lang_tot AS (
      SELECT lang, sum(cnt) AS total, count(*) AS v FROM lm GROUP BY lang),
    logp AS (
      SELECT lm.lang, w,
             ln(cast(cnt + 1 AS double) / cast(total + v AS double)) AS lp
      FROM lm JOIN lang_tot USING (lang)),
    per_doc AS (
      SELECT doc_id, tok.lang,
             round(-(cast(sum(cast(round(lp, 6) AS decimal(28,10))) AS double))
                   / count(*) + 1e-9, 4) AS nll
      FROM tok JOIN logp ON tok.lang = logp.lang AND tok.w = logp.w
      GROUP BY doc_id, tok.lang),
    dist AS (SELECT lang, nll, count(*) AS c FROM per_doc GROUP BY lang, nll),
    n_lang AS (SELECT lang, count(*) AS n FROM per_doc GROUP BY lang),
    cum AS (
      SELECT dist.lang, nll, n,
             sum(c) OVER (PARTITION BY dist.lang ORDER BY nll
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM dist JOIN n_lang USING (lang)),
    cuts AS (
      SELECT lang,
             min(CASE WHEN cum * 3 >= n THEN nll END) AS cut1,
             min(CASE WHEN cum * 3 >= n * 2 THEN nll END) AS cut2
      FROM cum GROUP BY lang)
    SELECT doc_id, per_doc.lang, nll,
           CASE WHEN nll <= cut1 THEN 'head'
                WHEN nll <= cut2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM per_doc JOIN cuts USING (lang)
    ORDER BY doc_id
    """

# ---------------------------------------------------------------------------
# fastText-style hashed linear quality classifier
# ---------------------------------------------------------------------------

# hashed feature space for the classifier (Joulin et al. 2016 use 10M
# bigram buckets at production scale; the bucket count only changes the
# collision rate, not the plan shape)
QC_BUCKETS = 4096


def _md5_weight(tag: str, bucket: Column) -> Column:
    """Deterministic uniform [-1, 1) weight for a feature bucket —
    the md5-derived closed form already proven cross-engine by the LSH
    hyperplanes (operators/ann.py): first 8 hex chars of
    md5('<tag>:<bucket>') as an unsigned 32-bit int, scaled. DuckDB
    twin: ('0x'||substr(md5('<tag>:'||b),1,8))::bigint/4294967295.0*2-1."""
    key = F.concat(F.lit(tag + ":"), bucket.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        / F.lit(4294967295.0) * 2 - 1
    )


def quality_classifier_scores(
    docs: DataFrame, buckets: int = QC_BUCKETS, bias: float = 0.05
) -> DataFrame:
    """fastText-style linear quality classifier (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification") — the
    model-based quality-filter stage of a web-corpus pipeline (GPT-3
    Appendix A and LLaMA both gate Common Crawl on a linear classifier
    over hashed bag-of-ngram features; reference analyzers/quality.py
    scores docs against corpus vocabulary with fixed weights, which
    this generalizes to a learned-weight shape).

    Features: word unigrams + bigrams, md5-hashed into ``buckets``
    cells (hashing trick — no vocabulary table at all). Weights: a
    FIXED md5-derived vector (deterministic stand-in for trained
    weights; training is out of engine scope, serving is the engine's
    job, same split as the B2 pluggable-inference scorer). Mean
    pooling: logit = bias + mean over feature occurrences of
    w[bucket]; prob = sigmoid(logit); keep = logit >= 0.

    Zero-shuffle scoring: the weight is a closed-form expression of
    the bucket id, so no model table is joined AT ALL — the whole
    score pipeline is explode_outer -> per-row expressions -> one
    doc_id hash-aggregate. explode_outer (not explode) keeps
    zero-token docs as a single null-feature row, so the bias-only
    branch needs NO second scan and NO corpus x corpus left join —
    one scan, one shuffle total. At 10^12 rows this is the cheapest
    possible shape (same cost class as gopher_quality_flags plus one
    shuffle).

    Float discipline: per-occurrence weights round(,6) -> exact
    decimal(28,10) sum -> double -> one division by the integer count
    -> + bias -> round(,6) = the logit BOTH engines agree on bitwise
    (IEEE division is correctly rounded). sigmoid's exp() is libm-
    dependent, so prob is round(,4)-with-epsilon DISPLAY output
    computed from the already-rounded logit; keep compares the
    bit-agreed logit, never the sigmoid.

    Output: (doc_id, n_feats, logit, prob, keep). Zero-token docs
    score the bare bias (no feature evidence).
    """
    tok = docs.select("doc_id", tokens("text").alias("toks"))
    feats = tok.select(
        "doc_id",
        F.explode_outer(
            F.concat(F.col("toks"), word_ngrams(F.col("toks"), 2))
        ).alias("feat"),
    )
    # null feat (zero-token doc) -> null weight; count/sum both skip it
    w = F.when(
        F.col("feat").isNotNull(),
        _md5_weight("qw", _md5_bucket(F.col("feat"), buckets)),
    )
    out = (
        feats.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("w").alias("n_feats"),
            F.round(
                F.coalesce(
                    _round6_decimal_sum(F.col("w")) / F.count("w"), F.lit(0.0)
                )
                + F.lit(bias) + F.lit(1e-9),
                6,
            ).alias("logit"),
        )
    )
    return out.select(
        "doc_id",
        "n_feats",
        "logit",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))) + F.lit(1e-9), 4
        ).alias("prob"),
        (F.col("logit") >= 0.0).alias("keep"),
    ).orderBy("doc_id")


def sql_quality_classifier_scores(
    docs_sql: str, token_re: str, buckets: int = QC_BUCKETS, bias: float = 0.05
) -> str:
    """DuckDB twin of quality_classifier_scores over (doc_id, text)."""
    bucket = sql_md5_bucket("feat", buckets)
    w = (
        f"(('0x' || substr(md5('qw:' || cast({bucket} AS varchar)), 1, 8))::bigint"
        f" / 4294967295.0 * 2 - 1)"
    )
    bias_logit = round(bias + 1e-9, 6)
    return f"""
    WITH docs AS ({docs_sql}),
    tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{token_re}') AS toks
      FROM docs),
    feats AS (
      SELECT doc_id, unnest(toks) AS feat FROM tok
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(toks) - 1, 0) + 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS feat
      FROM tok),
    per_doc AS (
      SELECT doc_id, count(*) AS n_feats,
             round(cast(sum(cast(round({w}, 6) AS decimal(28,10))) AS double)
                   / count(*) + {bias} + 1e-9, 6) AS logit
      FROM feats GROUP BY doc_id),
    scored AS (
      SELECT d.doc_id,
             coalesce(p.n_feats, 0) AS n_feats,
             coalesce(p.logit, {bias_logit}) AS logit
      FROM docs d LEFT JOIN per_doc p USING (doc_id))
    SELECT doc_id, n_feats, logit,
           round(1.0 / (1.0 + exp(-logit)) + 1e-9, 4) AS prob,
           (logit >= 0.0) AS keep
    FROM scored
    ORDER BY doc_id
    """
