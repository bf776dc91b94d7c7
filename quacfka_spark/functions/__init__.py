"""Reusable column-expression builders (vector math, text shingling).

All helpers return Catalyst expressions built from ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen eligible, no Python UDFs — so every
operator composed from them stays on the fast path at 100 TB.
"""
