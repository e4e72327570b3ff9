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


# --- pluggable model scorer (B2 pattern) -------------------------------------
# The reference runs HF transformer inference per row
# (analyzers/sentiment.py:445-449, 537-556). The engine's scale shape is
# an iterator-of-batches pandas UDF that loads the model ONCE per
# executor and scores Arrow batches. Torch/transformers are not in this
# container, so the default scorer is the deterministic keyword
# surrogate (identical semantics to functions/sentiment_rules
# surrogate_score); the loading pattern is what matters.


def make_scorer_udf(kind: str = "surrogate"):
    """Returns a pandas UDF text -> struct<label:string, confidence:double>.

    kind='surrogate': deterministic keyword scorer (no deps).
    kind='hf': loads a HuggingFace pipeline per executor (import-gated;
    raises ImportError here — wiring shown for cluster deployments).
    """
    import pandas as pd
    from pyspark.sql import types as TT

    out_type = TT.StructType(
        [
            TT.StructField("label", TT.StringType()),
            TT.StructField("confidence", TT.DoubleType()),
        ]
    )

    if kind == "hf":  # pragma: no cover - needs torch/transformers
        from collections.abc import Iterator

        @F.pandas_udf(out_type)
        def hf_scorer(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            from transformers import pipeline  # noqa: PLC0415

            model = pipeline("sentiment-analysis")  # loaded once per worker
            for s in batches:
                res = model(s.fillna("").tolist(), truncation=True, max_length=512)
                yield pd.DataFrame(
                    {
                        "label": [r["label"].lower() for r in res],
                        "confidence": [float(r["score"]) for r in res],
                    }
                )

        return hf_scorer

    from reviews_quality_check_spark.oracle.reference import TOKEN_RE
    from reviews_quality_check_spark.functions.sentiment_rules import (
        SURROGATE_NEGATIVE,
        SURROGATE_POSITIVE,
    )

    pos_set, neg_set = set(SURROGATE_POSITIVE), set(SURROGATE_NEGATIVE)

    @F.pandas_udf(out_type)
    def surrogate_scorer(s: pd.Series) -> pd.DataFrame:
        labels, confs = [], []
        for text in s:
            tok = TOKEN_RE.findall((text or "").lower())
            p = sum(1 for t in tok if t in pos_set)
            n = sum(1 for t in tok if t in neg_set)
            if p > n:
                labels.append("positive"); confs.append(min(0.98, 0.62 + 0.09 * (p - n)))
            elif n > p:
                labels.append("negative"); confs.append(min(0.98, 0.62 + 0.09 * (n - p)))
            else:
                labels.append("neutral"); confs.append(max(0.5, min(0.88, 0.88 - 0.04 * (p + n))))
        return pd.DataFrame({"label": labels, "confidence": confs})

    return surrogate_scorer


def sanitized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return sanitize_text_udf(c)


def extracted_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return extract_text_udf(c)
