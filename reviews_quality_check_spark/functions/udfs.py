"""Arrow-batched pandas UDFs — the ONLY Python in the hot path.

Each UDF here exists because the semantics genuinely cannot be a
Column expression:
  - sanitize_text_udf: NFKD normalization + ascii-encode-ignore
    (reference utils/text_processing.py:7-55). Unicode normalization
    tables are not exposed to Spark SQL; the per-url byte-identical
    invariant (BASELINE.json input_hint) is pinned to this exact chain.
  - extract_text_udf: html binary payload → extracted text (strip tags)
    + the sanitize chain, in one Arrow pass.

Everything else in the engine is JVM-side.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reviews_quality_check_spark.oracle.reference import _CHAR_MAP

_NON_PRINTABLE = re.compile(r"[^\x20-\x7E]")
_TAG = re.compile(rb"<[^>]*>")


def _sanitize_series(s: pd.Series) -> pd.Series:
    """Vectorized-ish sanitize chain; pandas .str ops where possible,
    unicodedata per distinct value (cached) for NFKD."""
    # replacement table (reference text_processing.py:14-46)
    def one(text):
        if text is None:
            return None
        if not isinstance(text, str):
            text = str(text)
        for old, new in _CHAR_MAP.items():
            text = text.replace(old, new)
        text = unicodedata.normalize("NFKD", text)
        text = text.encode("ascii", "ignore").decode("ascii")
        text = _NON_PRINTABLE.sub("", text)
        return " ".join(text.split())

    # cache on distinct values: web corpora have heavy text duplication,
    # and the map is pure — classic Arrow-batch optimization
    uniques = {v: one(v) for v in s.dropna().unique()}
    return s.map(lambda v: uniques.get(v) if v is not None else None)


@F.pandas_udf(T.StringType())
def sanitize_text_udf(s: pd.Series) -> pd.Series:
    return _sanitize_series(s)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html → tag-stripped, sanitized text (byte-identical to the
    oracle extract+sanitize chain)."""

    def one(payload):
        if payload is None:
            return None
        raw = _TAG.sub(b" ", bytes(payload))
        text = raw.decode("utf-8", errors="ignore")
        return text

    extracted = html.map(one)
    return _sanitize_series(extracted)


def sanitized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return sanitize_text_udf(c)


def extracted_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return extract_text_udf(c)
