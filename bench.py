"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line to stdout:

  {"metric": "total_bench_seconds", "value": N, "unit": "sec",
   "queries": {...headline-subset min seconds...}, "sf": 0.1, ...}

The final line is deliberately kept well under 1500 chars (hard-guarded
below): the driver records only a bounded tail of stdout, and round 4's
full 76-query min+median series outgrew it, leaving the official perf
record unparseable (BENCH_r04.json "parsed": null). The full per-query
min+median series now goes to a sidecar file ``BENCH_DETAIL.json`` next
to this script; the stdout line carries totals, the suite headline, the
most expensive / most representative queries, and the host load-average
marker so cross-round comparisons can spot contended windows.

The headline metric is the north-star shape: pages/second validated by
the flagship constraint suite over a synthetic Common-Crawl-style pages
table (BASELINE.json input_hint shape) generated in-Spark at a size
proportional to the SF. Query executions force full materialization via
the noop sink (no driver collect bottleneck).

Scaling evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py, which shells out to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "domain_cap_sample",
    "eval_holdout_sample",
    "packed_examples",
    "repeated_lines",
    "token_budget_sample",
    "source_upsample",
    "cleaning_verdicts",
    "suite_verdicts",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_nation",
    "orders_referential_violations",
    "event_type_windows",
    "drift_kl_daily",
    "doc_column_stats",
    "flesch_by_lang",
    "quality_by_source",
    "token_stats_by_lang",
    "lang_id_confusion",
    "ngram_diversity",
    "bigram_top10",
    "exact_dup_groups",
    "minhash_lsh_candidates",
    "near_dup_pairs",
    "simhash_buckets",
    "ann_brute_topk",
    "ann_lsh_topk",
    "sentiment_validation",
    "sentiment_eval_metrics",
    "sample_strata_counts",
    "blocked_similar_pairs",
    "winnowing_fingerprints",
    "embedding_near_dups",
    "column_stats_all",
    "sentence_flow_by_source",
    "events_sessionize",
    "customer_order_stats",
    "pricing_rollup",
    "drift_psi_daily",
    "sanitized_preview",
    "combined_similar_pairs_low",
    "phrase_bigram_scores",
    "umass_top_words",
    "cv_top_words",
    "multi_model_eval",
    "grammar_checks_docs",
    "scored_sentiments",
    "events_asof_clicks",
    "events_in_incident_windows",
    "dedup_keep_first_reviews",
    "token_counts_bpe",
    "lang_id_ngram_confusion",
    "media_features",
    "orders_grouping_sets",
    "vocabulary_scores",
    "sentence_length_variety",
    "duplicate_metrics_reviews",
    "combined_similar_pairs",
    "ann_ivf_topk",
    "nchars_digest",
    "renumber_docs",
    "near_dup_clusters",
    "near_dup_retained_docs",
    "text_dedup_retained",
    "media_decode_features",
    "lda_dictionary_extremes",
    "lda_doc_term_matrix",
    "doc_topic_entropy",
    "topic_coherence_weighted",
    "gopher_quality_flags",
    "pii_scrub",
    "repetition_flags",
    "url_host_stats",
    "decontamination_hits",
    "split_assignments",
    "sequence_packing",
    "png_pixel_stats",
    "tfidf_top_terms",
    "dsir_log_weights",
    "perplexity_buckets",
    "dup_ngram_spans",
    "semdedup_keep",
    "numeric_drift_psi_daily",
    "quality_classifier_scores",
    "bloom_decontamination_hits",
    "lang_temperature_sample",
    "doc_chunks",
    "suite_stream_verdicts",
    "embedding_quality_stats",
    "suite_profile_verdicts",
    "url_blocklist_verdicts",
    "url_canonical_dupes",
    "snapshot_churn",
    "lang_adaptive_floor",
    "extraction_parity",
    "suite_violations",
    "constraint_suggestions",
    "metric_anomalies",
    "schema_check_documents",
    "freshness_verdicts",
    "incremental_profile",
    "fd_verdicts",
    "corr_nchars_words",
]

# pages rows per unit SF (sf0.1 -> 300k synthetic pages)
PAGES_PER_SF = 3_000_000

# queries whose min timings ride on the compact stdout line (the rest
# are in BENCH_DETAIL.json): the flagship suite's components, the
# deliberately-expensive similarity block, and one representative per
# family so a driver-recorded line alone supports round-over-round
# comparison
HEADLINE_QUERIES = [
    "combined_similar_pairs",
    "combined_similar_pairs_low",
    "blocked_similar_pairs",
    "simhash_buckets",
    "near_dup_pairs",
    "minhash_lsh_candidates",
    "exact_dup_groups",
    "cleaning_verdicts",
    "gopher_quality_flags",
    "drift_kl_daily",
    "token_budget_sample",
    "domain_cap_sample",
    "ann_lsh_topk",
    "pricing_summary",
    "doc_column_stats",
]

# driver tail capture is 2000 chars; leave headroom for its own wrapping
MAX_STDOUT_LINE = 1500


def main() -> None:
    # co-tenant load marker BEFORE Spark spins up: this virtualized host
    # sees multi-hour windows where whole-suite benches run uniformly
    # ~1.4x slower with zero own processes (BENCH.md r4 addendum), so a
    # number without the load context is a weather report
    load1_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    from pyspark.sql import functions as F

    from reviews_quality_check_spark.queries import QUERIES
    from reviews_quality_check_spark.session import get_spark
    from reviews_quality_check_spark.sources.pages import synth_pages

    n_cores = int(cpus) if cpus != "*" else (os.cpu_count() or 8)
    spark = get_spark(app_name="rqc-bench", cores=cpus, shuffle_partitions=n_cores * 2)

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # untimed JVM/codegen warm-up so the first timed query doesn't absorb
    # ~10s of tiered-JIT + session init (cluster executors amortize this)
    materialize(QUERIES["doc_column_stats"](spark, sf_dir))

    # per-query best-of-2: this virtualized host shows multi-x contention
    # spikes in single-shot timings (r2: 25.2s driver vs 5.1s local for
    # the identical warmed query), which manufactured phantom regressions
    # across rounds. Queries are cheap at sf0.1; the second pass also
    # reuses the now-JIT-compiled codegen, so best-of-2 is the
    # steady-state number a long-lived cluster executor would see.
    # Both passes are recorded and the median is reported alongside the
    # min (ADVICE r3: min-of-N biases headlines upward and r1/r2
    # baselines were single-shot — cross-round deltas are methodology-
    # mixed unless both stats are visible).
    import statistics

    timings: dict[str, float] = {}
    timings_median: dict[str, float] = {}
    # The suite headline runs FIRST, in a near-fresh JVM: measured
    # r5, running it after the 88-query loop inflated it 1.6x (15.1s
    # vs 9.3s fresh-JVM, same weather) from accumulated heap/GC
    # pressure — a production validation job is a dedicated
    # application, not the 89th query of a long-lived benchmark JVM.
    # north-star headline: constraint-suite validation throughput on the
    # pages shape (url/warc_ts/html/text/lang), suite = null/blank + lang
    # referential + uniqueness(url) + readability floor
    from reviews_quality_check_spark.functions.readability import flesch_reading_ease_fast
    from reviews_quality_check_spark.plans import checks as C
    from reviews_quality_check_spark.plans.runner import SuiteRunner
    from reviews_quality_check_spark.sources.pages import VALID_LANGS

    n_pages = max(int(PAGES_PER_SF * sf), 10_000)
    # materialize the synthetic table to parquet first: the engine's input
    # contract is a stored table (Iceberg-style), not a generator tree —
    # and benchmarking the suite must include a real storage scan
    import tempfile

    pages_path = tempfile.mkdtemp(prefix="rqc_bench_") + "/pages"
    synth_pages(spark, n_pages).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    # exact-dedup fingerprint on the same scan: uniqueness over the
    # normalized-text md5 is the A1 exact-dup operator expressed as a
    # constraint (one extra projection, no second scan)
    from reviews_quality_check_spark.functions.text import norm_text

    pages = pages.withColumn("fp", F.md5(norm_text(F.col("text"))))
    suite = C.Suite(name="pages_suite", row_key="url")
    suite.add(C.not_blank("text"))
    suite.add(C.in_set("lang", VALID_LANGS))
    suite.add(C.expression_floor("flesch_floor", flesch_reading_ease_fast("text"), 5.0))
    # cleaning-path coverage (VERDICT r4 next-round #6): the Gopher/C4
    # flags a training pipeline gates on, as one suite RowCheck. The
    # corpus-appropriate subset (8-40 word synthetic pages can never
    # pass word_count>=50 / min_sentences>=3, documented in
    # functions/quality.gopher_flags) — planted blank/dup rows violate
    # via the n>0 term, so the check is non-vacuous.
    from reviews_quality_check_spark.functions.quality import gopher_flags

    gf = gopher_flags(F.col("text"))
    suite.add(
        C.predicate(
            "gopher_core",
            gf["mean_word_len_ok"] & gf["symbol_ratio_ok"]
            & gf["alpha_ratio_ok"] & gf["no_brace"] & gf["no_lorem"],
        )
    )
    suite.add(C.uniqueness("url"))
    suite.add(C.uniqueness("fp"))
    # window-over-window drift ceiling on the same table (KL across
    # daily lang distributions) — the headline pages/s now covers the
    # drift path too (VERDICT r3 next-round #7)
    suite.add(C.max_drift("warc_ts", "lang", "1 day", threshold=5.0))

    # warm-up: two untimed full passes. Cold JVMs pay tiered-JIT warm-up
    # (Janino codegen + C2 compilation of regex/codegen methods, ~50s);
    # long-lived cluster executors amortize this across hours, so the
    # reported number is steady-state throughput.
    for _ in range(2):
        warm = SuiteRunner(suite).run(pages, F.to_date("warc_ts").cast("string"), resume=False)
        materialize(warm.verdicts)
        materialize(warm.violations)

    # three timed passes, best reported as steady-state throughput (this
    # virtualized host shows 20-40% run variance and occasional 10x GC /
    # contention spikes — all passes are recorded for honesty). If the
    # pass set itself is noisy (max/min spread > 1.6x), run up to two
    # extra passes instead of publishing a contended-window number as
    # the round's record (VERDICT r4 next-round #8).
    def timed_pass() -> float:
        t0 = time.perf_counter()
        res = SuiteRunner(suite).run(
            pages, F.to_date("warc_ts").cast("string"), resume=False
        )
        materialize(res.verdicts)
        materialize(res.violations)
        return round(time.perf_counter() - t0, 3)

    passes = [timed_pass() for _ in range(3)]
    suite_retries = 0
    while max(passes) / min(passes) > 1.6 and suite_retries < 2:
        print(
            f"[bench] noisy suite pass set {passes} (spread "
            f"{max(passes) / min(passes):.2f}x) — retrying",
            file=sys.stderr,
        )
        passes.append(timed_pass())
        suite_retries += 1
    suite_sec = min(passes)
    timings["pages_suite_validation"] = suite_sec
    pages_per_sec = round(n_pages / suite_sec, 1)
    print(
        f"[bench] pages_suite_validation: best {suite_sec:.2f}s of {passes} "
        f"({n_pages} pages -> {pages_per_sec} pages/s)",
        file=sys.stderr,
    )

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        passes_q = []
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            passes_q.append(time.perf_counter() - t0)
        timings[name] = round(min(passes_q), 3)
        timings_median[name] = round(statistics.median(passes_q), 3)
        print(
            f"[bench] {name}: min {timings[name]:.2f}s "
            f"median {timings_median[name]:.2f}s",
            file=sys.stderr,
        )

    timings_median["pages_suite_validation"] = round(statistics.median(passes), 3)
    total = round(sum(timings.values()), 3)
    common = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cores": n_cores,
        "n_queries": len(timings),
        "total_median": round(sum(timings_median.values()), 3),
        "pages_validated": n_pages,
        "validated_pages_per_sec": pages_per_sec,
        "validated_pages_per_sec_median": round(
            n_pages / statistics.median(passes), 1
        ),
        "suite_passes_sec": passes,
        "suite_retries": suite_retries,
        "load1_start": load1_start,
        "load1_end": round(os.getloadavg()[0], 2),
    }
    # full min+median series -> sidecar next to this script (committed by
    # the builder; the driver-recorded stdout line stays compact)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {**common, "queries": timings, "queries_median": timings_median},
            fh,
            indent=1,
            sort_keys=True,
        )
    # compact stdout line: headline subset only, hard-capped — halve the
    # subset rather than ever exceed the driver's tail capture again
    headline = ["pages_suite_validation"] + [
        q for q in HEADLINE_QUERIES if q in timings
    ]
    while True:
        out = {
            **common,
            "queries": {q: timings[q] for q in headline},
            "detail": "BENCH_DETAIL.json",
        }
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= MAX_STDOUT_LINE or len(headline) <= 1:
            break
        headline = headline[: max(1, len(headline) // 2)]
    spark.stop()
    print(line)


if __name__ == "__main__":
    main()
