"""Dataset-level analytics: dedup, similarity search, text statistics,
and relational query battery — all native ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen) unless a kernel genuinely needs Python.
"""
