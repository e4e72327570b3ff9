"""Byte-identical sanitize-chain invariant (BASELINE.json input_hint:
'byte-identical extracted text per url'): the pandas UDF output must
equal the oracle port of reference utils/text_processing.py:7-55,
byte for byte, including on unicode-dirty html payloads."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.udfs import extracted_text, sanitized_text
from reviews_quality_check_spark.oracle import reference as O

DIRTY = [
    "plain ascii stays as is",
    "“smart quotes” and ‘singles’",
    "en–dash em—dash minus−sign",
    "ellipsis… bullet • list",
    "non breaking space",
    "soft­hyphen zero​width ﻿bom",
    "café naïve résumé über",  # NFKD + ascii-ignore
    "½ fraction ™ trademark ©",
    "multiple    spaces\t\ttabs\n\nnewlines",
    "control\x01chars\x7fremoved",
    "日本語 mixed with ascii",
    "",
]


def test_sanitize_bytes(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(DIRTY)], "i long, t string")
    got = {r["i"]: r["s"] for r in df.select("i", sanitized_text("t").alias("s")).collect()}
    for i, t in enumerate(DIRTY):
        want = O.sanitize_text(t)
        assert got[i].encode() == want.encode(), f"{i}: {got[i]!r} != {want!r}"


def test_extract_text_from_html(spark):
    pages = [
        b"<html><body>hello world</body></html>",
        "<html><body>“quoted” – café</body></html>".encode(),
        b"<div class='x'>nested <b>bold</b> text</div>",
        None,
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "i long, html binary")
    got = {r["i"]: r["s"] for r in df.select("i", extracted_text("html").alias("s")).collect()}

    def oracle_extract(payload):
        if payload is None:
            return None
        raw = re.sub(rb"<[^>]*>", b" ", payload)
        return O.sanitize_text(raw.decode("utf-8", errors="ignore"))

    for i, p in enumerate(pages):
        want = oracle_extract(p)
        assert got[i] == want, f"{i}: {got[i]!r} != {want!r}"
    assert got[0] == "hello world"
    assert got[1] == '"quoted" - cafe'


def test_synth_pages_sanitize_roundtrip(spark):
    """End-to-end: synth pages html → extracted_text matches oracle on
    every row (the per-url invariant at fixture scale)."""
    from reviews_quality_check_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 300).select("url", "html")
    rows = pages.select("url", "html", extracted_text("html").alias("s")).collect()
    assert len(rows) == 300
    n_dirty = 0
    for r in rows:
        payload = bytes(r["html"])
        raw = re.sub(rb"<[^>]*>", b" ", payload).decode("utf-8", errors="ignore")
        want = O.sanitize_text(raw)
        assert r["s"].encode() == want.encode(), r["url"]
        if "café".encode() in payload or b"\xe2\x80\x9c" in payload:
            n_dirty += 1
    assert n_dirty > 0, "fixture must exercise unicode-dirty rows"
