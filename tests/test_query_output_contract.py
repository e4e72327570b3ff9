"""Driver-contract guard: every registered query must emit a schema the
driver's pandas canonicalizer can sort and hash — scalar columns only.

CORRECTNESS_r02 recorded two `TypeError: unhashable type: 'list'` rows
(media_features, nchars_digest) caused by array<float>/array<double>
output columns; those are now serialized to CSV strings. This test keeps
the whole 67-query registry canonicalizer-safe: it builds each query's
DataFrame at sf0.001 (plan + schema only, nothing is executed beyond
what query construction itself requires) and asserts no Array/Map/Struct
or binary column survives to the output.
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_all_query_outputs_are_scalar(spark):
    import __spark_entry__ as entry

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, BinaryType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert offenders == [], f"non-scalar output columns: {offenders}"


def test_every_registered_query_has_an_oracle():
    """r4 invariant: a registered-but-oracle-less query is the one thing
    that can keep a driver sample from being 100% green (the r3
    lda_topics lesson) — the registry must stay FULLY oracled. Genuinely
    non-SQL-expressible outputs (seeded model fits) stay out of the
    registry and are pytest-verified instead."""
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o == q, (
        f"oracle entries without a query: {sorted(o - q)}; "
        f"queries without an oracle: {sorted(q - o)}"
    )
