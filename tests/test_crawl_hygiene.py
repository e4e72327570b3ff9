"""Hand-computed fixtures for the crawl-hygiene family: URL
canonicalization edge cases, per-language adaptive floors, snapshot
churn status assignment, and html extraction parity with the clean-room
oracle chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.url import canonical_url


def _urls(spark, urls):
    arr = F.array(
        *[
            F.struct(F.lit(i).cast("long").alias("i"), F.lit(u).alias("url"))
            for i, u in enumerate(urls)
        ]
    )
    return spark.range(1).select(F.explode(arr).alias("r")).select("r.*")


def test_canonical_url_hand_cases(spark):
    cases = {
        # host case + default https port + fragment
        "https://WWW.Example.COM:443/a/b.html#frag": "https://www.example.com/a/b.html",
        # default http port stripped too (scheme rebuilt as https — the
        # crawl store normalizes schemes before this layer)
        "https://example.com:80/x": "https://example.com/x",
        # non-default port KEPT
        "https://example.com:8080/x": "https://example.com:8080/x",
        # utm params dropped, remaining sorted, '?' kept only if non-empty
        "https://e.com/p?utm_source=f&b=2&a=1": "https://e.com/p?a=1&b=2",
        "https://e.com/p?utm_source=f&utm_medium=m": "https://e.com/p",
        # empty path -> '/'
        "https://e.com?a=1": "https://e.com/?a=1",
        # empty query components filtered
        "https://e.com/p?&&a=1&": "https://e.com/p?a=1",
        # no query, no fragment: unchanged
        "https://e.com/p": "https://e.com/p",
    }
    df = _urls(spark, list(cases))
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url("url").alias("c")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw], want)


def test_canonical_url_idempotent(spark):
    raws = [
        "https://WWW.E.COM:443/a?utm_x=1&b=2&a=1#f",
        "https://e.com:8080/p?z=1&y=2",
        "https://e.com",
    ]
    df = _urls(spark, raws).select(canonical_url("url").alias("c1"))
    df = df.select("c1", canonical_url("c1").alias("c2"))
    for r in df.collect():
        assert r["c1"] == r["c2"], r


def test_lang_adaptive_floor_hand_computed(spark):
    # lang 'a': 10 docs with n_chars 1..10 -> cum at 1 is 1, 10*1 >= 10
    #   -> floor = 1, n_at_or_below = 1
    # lang 'b': n_chars [5,5,5,7] -> smallest value with 10*cum >= 4*1?
    #   total=4; value 5 has cum 3, 30 >= 4 -> floor 5, below 3
    arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("doc_id"),
                F.lit(lang).alias("lang"),
                F.lit(n).cast("long").alias("n_chars"),
            )
            for i, (lang, n) in enumerate(
                [("a", k) for k in range(1, 11)] + [("b", 5), ("b", 5), ("b", 5), ("b", 7)]
            )
        ]
    )
    docs = spark.range(1).select(F.explode(arr).alias("r")).select("r.*")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(td + "/documents.parquet")
        from reviews_quality_check_spark.queries import QUERIES

        out = {r["lang"]: r for r in QUERIES["lang_adaptive_floor"](spark, td).collect()}
    assert out["a"]["p10_floor"] == 1
    assert out["a"]["n_at_or_below"] == 1
    assert out["a"]["n_total"] == 10
    assert out["b"]["p10_floor"] == 5
    assert out["b"]["n_at_or_below"] == 3
    assert out["b"]["n_total"] == 4


def test_extraction_matches_cleanroom_chain(spark):
    from reviews_quality_check_spark.functions.udfs import extracted_text
    from reviews_quality_check_spark.oracle.reference import extract_text
    from reviews_quality_check_spark.sources.planted import (
        _PLANTED_HTML,
        planted_html_docs,
    )

    got = {
        r["doc_id"]: r["x"]
        for r in planted_html_docs(spark)
        .select("doc_id", extracted_text("html").alias("x"))
        .collect()
    }
    for i, payload in _PLANTED_HTML:
        assert got[i] == extract_text(payload), (i, got[i])


def test_byte_parity_check_flags_corrupt_rows(spark):
    """byte_parity = the north_star extraction invariant as a suite
    RowCheck: only rows whose stored text deviates from re-extraction
    violate; both-null passes; one-null violates."""
    from reviews_quality_check_spark.functions.udfs import extracted_text
    from reviews_quality_check_spark.plans import checks as C
    from reviews_quality_check_spark.plans.runner import SuiteRunner

    rows = [
        # (key, stored_text, page_text, lang) — page_text is what the
        # html actually contains; stored == extracted for clean rows
        (1, "alpha beta", "alpha beta", "en"),
        (2, "gamma delta", "gamma delta", "en"),
        (3, "STALE text", "fresh text", "de"),   # corrupt: stored drifted
        (4, None, None, "de"),                   # both null: same content
        (5, None, "only page has it", "fr"),     # one null: violation
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("key"),
                F.lit(s).cast("string").alias("text"),
                (
                    F.lit(None).cast("binary")
                    if p is None
                    else F.concat(
                        F.lit("<html><body>"), F.lit(p), F.lit("</body></html>")
                    ).cast("binary")
                ).alias("html"),
                F.lit(lg).alias("lang"),
            )
            for k, s, p, lg in rows
        ]
    )
    pages = spark.range(1).select(F.explode(arr).alias("r")).select("r.*")
    pages = pages.withColumn("extracted", extracted_text("html"))

    suite = C.Suite(name="parity_suite", row_key="key")
    suite.add(C.byte_parity("text_extraction_parity", F.col("extracted"), F.col("text")))
    res = SuiteRunner(suite).run(pages, F.col("lang"), resume=False)
    verdicts = {r["partition_id"]: r for r in res.verdicts.collect()}
    assert verdicts["en"]["passed"] is True
    assert verdicts["de"]["passed"] is False
    assert verdicts["de"]["violation_count"] == 1   # key 3 only; key 4 passes
    assert verdicts["fr"]["passed"] is False
    viol = {(r["partition_id"], r["row_key"]) for r in res.violations.collect()}
    assert viol == {("de", "3"), ("fr", "5")}
