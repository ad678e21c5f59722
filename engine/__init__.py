"""PySpark-native full-text index + BM25 query engine.

A brand-new engine with the capabilities of the reference
``Ryanray13/Web_Search_Engine`` (see SURVEY.md; the reference snapshot was
not delivered to this sandbox — SURVEY.md §0 — so parity targets come from
BASELINE.json's functional spec, not reference file:line).

Spark-first architecture: DataFrame plans end-to-end, Arrow-vectorized
UDFs (``pandas_udf`` / ``mapInArrow`` / ``applyInPandas``) for the codec and
scorer, zero per-row Python.
"""

__version__ = "0.1.0"
