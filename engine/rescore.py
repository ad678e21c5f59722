"""Query rescoring — the Elasticsearch ``rescore`` window (score_mode
``total``, the ES default): re-rank the primary query's top-``window``
docs by adding a secondary query's BM25 score, each side weighted.

Frozen contract (mirrored by the DuckDB oracle twin in
``__spark_entry__._rescore_sql``):

* the rescore WINDOW is the primary query's top-``window`` under its
  own frozen (score desc, doc_id asc) order — docs outside the window
  are never rescored and never appear in the result (``k <= window``
  is enforced);
* the secondary query is scored ONLY over the window docs, with
  corpus-GLOBAL stats (N, avgdl, idf — the same frozen filter
  semantics as ``doc_filter``); a window doc that does not match the
  secondary query contributes ``0.0`` (the ES
  ``query_weight``-only degenerate case);
* ``final = query_weight * primary + rescore_weight * secondary`` —
  one float64 fma-free expression per doc, evaluated in that literal
  order (multiply, multiply, add) so engine and oracle agree bitwise
  before the round-6 gate comparison;
* the result is the top-``k`` of the window under
  (final desc, doc_id asc).

Plan shape (the 100 TB argument): the primary is ONE unchanged pruned-
scan job at ``k = window``; its <= window collected ids (metadata-
sized, the ``_collect_topk`` class) become a literal local-relation
allowed side for the secondary — the SAME cogrouped-mask kernel as
``doc_filter`` but with ZERO corpus scan, so the secondary job reads
only the rescore query's own pruned postings buckets. ``k = window``
on the secondary guarantees every matching window doc survives its
top-k cut (<= window candidates exist by construction). The weighted
combine is driver-side over <= window rows; the result is a jobless
local relation. Nothing corpus-sized moves at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import query as Q

RESCORE_SCHEMA = "doc_id long, score double"


def search_rescore(index, query: str, rescore_query: str, k: int = 10,
                   window: int = 50, query_weight: float = 1.0,
                   rescore_weight: float = 1.0, mode: str = "OR",
                   exclude: str | None = None,
                   doc_filter: str | None = None) -> DataFrame:
    """Rescored top-k (see the frozen contract above). ``mode`` /
    ``exclude`` / ``doc_filter`` apply to the PRIMARY query (they define
    the window); the secondary query is always OR (the ES rescore query
    is a scoring query, not a filter). Returns (doc_id, score) where
    ``score`` is the weighted combination — not a raw BM25 value."""
    Q._warn_if_stale(index)
    if int(k) > int(window):
        raise ValueError(f"k ({k}) must be <= window ({window}): docs "
                         "outside the rescore window are never rescored")
    wq, wr = float(query_weight), float(rescore_weight)
    primary = Q.search(index, query, k=int(window), mode=mode,
                       exclude=exclude, doc_filter=doc_filter).collect()
    if not primary:
        return Q._empty_topk(index.spark)
    ids = [int(r["doc_id"]) for r in primary]
    sec = Q._search_impl(index, rescore_query, k=int(window),
                         mode="OR", allowed_ids=ids).collect()
    smap = {int(r["doc_id"]): float(r["score"]) for r in sec}
    fused = [(d, wq * float(r["score"]) + wr * smap.get(d, 0.0))
             for d, r in zip(ids, primary)]
    top = sorted(fused, key=lambda t: (-t[1], t[0]))[:int(k)]
    return index.spark.createDataFrame(top, RESCORE_SCHEMA)
