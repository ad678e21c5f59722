"""Reciprocal-rank fusion (RRF) — hybrid retrieval over multiple ranked
retrievers (the Elasticsearch 8.x ``rrf`` retriever / Cormack et al.'s
reciprocal-rank fusion): combine the top-``window`` results of N
independent retrievers — BM25 queries, phrase queries, prefix queries,
sort-by-field (recency) retrievers — into one ranking without score
calibration between them.

Frozen contract (mirrored by the DuckDB oracle twin):

* each retriever contributes ``1 / (rank_const + rank)`` for every doc
  in ITS top-``window``, where ``rank`` is the 1-based position under
  that retriever's own frozen total order (ranks beyond ``window``
  contribute nothing — the ES ``rank_window_size`` rule);
* a doc's fused score is the float64 sum of its contributions in
  RETRIEVER-LIST ORDER (fixed summation order -> bit-reproducible,
  like every other score in this engine);
* the fused top-k is ordered (fused score desc, doc_id asc).

Plan shape (the 100 TB argument): each retriever runs as its own
unchanged ONE-JOB plan (pruned postings scan, per-shard kernel, <= k
rows per shard, TakeOrderedAndProject) with ``k = window``. The fusion
itself touches only the <= N x window collected rank rows — metadata-
sized by construction, exactly the ``_collect_topk`` class — so it runs
driver-side and the result is a jobless local relation (the
``term_vectors`` pattern). Nothing corpus-sized moves for the fusion
step at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import query as Q

RRF_SCHEMA = "doc_id long, score double"


def _run_retriever(index, spec: dict, window: int) -> DataFrame:
    """One retriever spec -> its top-``window`` DataFrame (the spec's
    own frozen order). Specs follow search_batch's dict shape:
    ``mode`` picks the query family (OR/AND/PHRASE/PREFIX; default OR),
    ``sort_field`` (+ optional ``ascending``) picks the sort-by-field
    retriever instead, and ``exclude``/``doc_filter``/``dv_filter``/
    ``min_match``/``term_boosts``/``slop``/``max_expansions`` pass
    through to the underlying query."""
    s = dict(spec)
    q = s.pop("query")
    mode = str(s.pop("mode", "OR")).upper()
    if "sort_field" in s:
        return Q.search_sorted(
            index, q, s["sort_field"], k=window,
            mode=mode if mode in ("AND", "OR") else "AND",
            ascending=bool(s.get("ascending", False)),
            exclude=s.get("exclude"), dv_filter=s.get("dv_filter"))
    if mode == "PHRASE":
        return Q.search_phrase(index, q, k=window,
                               doc_filter=s.get("doc_filter"),
                               exclude=s.get("exclude"),
                               slop=int(s.get("slop", 0)))
    if mode == "PREFIX":
        return Q.search_prefix(index, q, k=window,
                               max_expansions=int(s.get("max_expansions",
                                                        64)),
                               exclude=s.get("exclude"),
                               doc_filter=s.get("doc_filter"))
    if mode not in ("OR", "AND"):
        raise ValueError(f"unknown retriever mode {mode!r}")
    return Q.search(index, q, k=window, mode=mode,
                    exclude=s.get("exclude"),
                    doc_filter=s.get("doc_filter"),
                    dv_filter=s.get("dv_filter"),
                    min_match=s.get("min_match"),
                    term_boosts=s.get("term_boosts"))


def search_rrf(index, retrievers: list, k: int = 10, window: int = 100,
               rank_const: float = 60.0) -> DataFrame:
    """Fused top-k over ``retrievers`` (list of retriever spec dicts,
    see ``_run_retriever``) under the frozen RRF contract above.
    Returns (doc_id, score) where ``score`` is the fused RRF score —
    NOT a BM25 value (reciprocal ranks are the whole point: no
    cross-retriever score calibration).

    ``window``: per-retriever rank cutoff (ES ``rank_window_size``).
    ``rank_const``: the RRF smoothing constant (ES default 60)."""
    Q._warn_if_stale(index)
    if not retrievers:
        raise ValueError("search_rrf needs at least one retriever spec")
    if int(window) < 1:
        raise ValueError("window must be >= 1")
    rc = float(rank_const)
    scores: dict[int, float] = {}
    for spec in retrievers:
        rows = _run_retriever(index, spec, int(window)).collect()
        for rank, row in enumerate(rows, start=1):
            d = int(row["doc_id"])
            scores[d] = scores.get(d, 0.0) + 1.0 / (rc + rank)
    top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
    return index.spark.createDataFrame(
        [(d, s) for d, s in top], RRF_SCHEMA)
