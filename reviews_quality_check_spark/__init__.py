"""reviews_quality_check_spark — a PySpark-native schema + constraint
validation engine.

From-scratch re-expression of the capabilities of
Davtan00/Reviews-Quality-Check (per-record quality scoring, exact/near
duplicate detection, sentiment-mismatch validation, n-gram diversity,
distribution-drift checks) as declarative constraint suites compiled to
Spark DataFrame expressions and vectorized pandas/Arrow UDFs.

Design notes
------------
- Everything is DataFrame/SQL; Catalyst handles pushdown/pruning/join
  selection. No RDDs.
- Per-row Python is forbidden: the only Python in the hot path is
  Arrow-batched pandas UDFs (text sanitize NFKD chain, embedding codecs).
- Built for a 1000-executor cluster over ~100 TB: all pair-generation is
  sub-quadratic (MinHash-LSH banding), hot keys are salted two-phase
  aggregates, small dimensions broadcast, and suites compile to ONE scan
  with bounded shuffles.
"""

__version__ = "0.1.0"

from reviews_quality_check_spark.session import get_spark  # noqa: F401
