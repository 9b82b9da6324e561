"""Pure per-document kernels — pandas/NumPy only, ZERO Spark imports.

Each module here is unit-testable in-process; the Spark layer
(``pdf_extractor_spark.plans``) wires them into ``mapInPandas`` stages.
"""
