"""Column-expression library (JVM-side, codegen'd — the fast path).

Every function here returns a pyspark ``Column`` built from built-in
``pyspark.sql.functions`` so it stays inside whole-stage codegen; the
only pandas UDFs live in ``udfs.py``.
"""
