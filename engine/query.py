"""Query engine (SURVEY.md §2.E, §3 entry point 2).

M1 layer: **expression-form BM25** over the flat postings IR — the whole
score is a Catalyst expression tree (JVM codegen, zero Python in the hot
path), ending in ``orderBy().limit(k)`` which compiles to
``TakeOrderedAndProject`` (per-partition top-k heap + driver merge).
This form doubles as the oracle-parallel path: the identical formula is
expressible in DuckDB SQL for the driver's correctness gate.

The packed-index WAND path (M2/M4) lives alongside and must produce
rank-identical results — that equivalence is itself a test.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

from .analyzer import tokenize_py
from .build import FlatIndex
from .config import BM25Config


def query_terms(query: str) -> dict[str, int]:
    """query string -> {term: qtf}, via the SAME frozen analyzer (E1)."""
    return dict(Counter(tokenize_py(query)))


def bm25_score_col(tf_col, dl_col, idf_col, qtf_col, avgdl: float,
                   cfg: BM25Config):
    """Per-(doc,term) BM25 contribution as a Spark Column (mirrors
    oracle.OracleIndex.search summand exactly)."""
    k1, b = F.lit(cfg.k1), F.lit(cfg.b)
    denom = tf_col + k1 * (F.lit(1.0) - b + b * dl_col / F.lit(float(avgdl)))
    return qtf_col * idf_col * (tf_col * (k1 + F.lit(1.0))) / denom


def search_flat(idx: FlatIndex, query: str, k: int = 10,
                mode: str = "OR") -> DataFrame:
    """BM25 top-k over the flat postings IR.

    Returns (doc_id, score) ordered by (score desc, doc_id asc), k rows.
    mode=AND keeps only docs containing ALL distinct query terms
    (posting-list intersection as a grouped count filter — the DataFrame
    form of a k-way semi-join).
    """
    spark = idx.docs.sparkSession
    qtf = query_terms(query)
    empty = idx.postings.sparkSession.createDataFrame(
        [], "doc_id long, score double")
    if not qtf:
        return empty
    qdf = spark.createDataFrame(
        [(t, float(n)) for t, n in sorted(qtf.items())], "term string, qtf double")
    # broadcast tiny dims: query terms and their lexicon rows (E2)
    lex = idx.lexicon.join(F.broadcast(qdf), "term").select("term", "idf", "qtf")
    n_known = lex.count()
    if mode.upper() == "AND" and n_known < len(qtf):
        return empty  # a required term is absent from the corpus
    if n_known == 0:
        return empty
    scored = (idx.postings
              .join(F.broadcast(lex), "term")
              .withColumn("_s", bm25_score_col(
                  F.col("tf").cast("double"), F.col("dl").cast("double"),
                  F.col("idf"), F.col("qtf"), idx.avgdl, idx.cfg.bm25))
              .groupBy("doc_id")
              .agg(F.sum("_s").alias("score"), F.count("*").alias("_nt")))
    if mode.upper() == "AND":
        scored = scored.filter(F.col("_nt") == n_known)
    return (scored.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


# --------------------------------------------------------------------------
# Packed-index query path (E3/E5/E6/E7): partition-pruned scan -> per-shard
# DAAT scoring in Arrow UDFs -> global TakeOrderedAndProject
# --------------------------------------------------------------------------

def _score_shard_exhaustive(post_pdf, qmeta, cfg, k, mode, width):
    """Score one doc-range shard: dense-offset accumulators, numpy only.

    Per-posting document lengths come from the inlined ``dls`` stream —
    the scorer needs nothing but the (pruned) postings scan itself.
    Accumulation is per-term in ASCENDING term order — the identical
    float64 summation order as the pure-Python oracle (rank-identity).
    Emits at most k rows (per-shard top-k heap analog).
    """
    import numpy as np
    from . import codec as C
    if len(post_pdf) == 0:
        return None
    shard = int(post_pdf["shard"].iloc[0])
    start = shard * width
    acc = np.zeros(width, dtype=np.float64)
    cnt = np.zeros(width, dtype=np.int32)
    k1, b, avgdl = cfg["k1"], cfg["b"], cfg["avgdl"]
    order = np.argsort(post_pdf["term"].to_numpy(object))  # ascending terms
    for i in order:
        term = post_pdf["term"].iloc[int(i)]
        idf, qtf = qmeta[term]
        ids, tfs = C.decode_postings(post_pdf["doc_ids"].iloc[int(i)],
                                     post_pdf["tfs"].iloc[int(i)])
        dls = C.vbyte_decode(post_pdf["dls"].iloc[int(i)]).astype(np.float64)
        loc = ids - start
        tfs = tfs.astype(np.float64)
        contrib = (qtf * idf * (tfs * (k1 + 1.0))
                   / (tfs + k1 * (1.0 - b + b * dls / avgdl)))
        acc[loc] += contrib   # doc_ids unique within one (term, shard) row
        cnt[loc] += 1
    if mode == "AND":
        hit = np.flatnonzero(cnt == len(qmeta))
    else:
        hit = np.flatnonzero(cnt > 0)
    if hit.size == 0:
        return None
    scores = acc[hit]
    if hit.size > k:
        part = np.argpartition(-scores, k - 1)[:k]
        hit, scores = hit[part], scores[part]
    srt = np.lexsort((hit, -scores))  # score desc, doc_id asc
    import pandas as pd
    return pd.DataFrame({"doc_id": (hit[srt] + start).astype(np.int64),
                         "score": scores[srt]})


def search(index, query: str, k: int = 10, mode: str = "OR",
           use_wand: bool = True) -> DataFrame:
    """BM25 top-k over the packed on-disk index.

    Plan: lexicon lookup (term-pushdown collect) -> postings scan pruned to
    the query terms' buckets (partition pruning) and terms (predicate
    pushdown) -> cogroup with docmap by shard -> Arrow-batch scorer emits
    <= k rows per shard -> orderBy(score desc, doc_id).limit(k)
    (TakeOrderedAndProject).
    """
    from .build import PackedIndex  # noqa: F401 (typing)
    spark = index.spark
    mode = mode.upper()
    qtf = query_terms(query)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not qtf:
        return empty
    lex = index.lookup_terms(sorted(qtf))
    if mode == "AND" and len(lex) < len(qtf):
        return empty
    if not lex:
        return empty
    buckets = sorted({v["bucket"] for v in lex.values()})
    terms = sorted(lex)
    qmeta = {t: (lex[t]["idf"], float(qtf[t])) for t in terms}
    cols = ["term", "shard", "df", "doc_ids", "tfs", "dls"] + (
        ["blocks", "max_tf"] if use_wand and mode == "OR" else [])
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
            .select(*cols))
    width = index.shard_width
    cfgd = {"k1": index.cfg.bm25.k1, "b": index.cfg.bm25.b, "avgdl": index.avgdl}

    if use_wand and mode == "OR":
        from .wand import score_shard_wand as scorer_fn

        def fn(key, post_pdf):
            import pandas as pd
            r = scorer_fn(post_pdf, qmeta, cfgd, k, width)
            return r if r is not None else pd.DataFrame(
                {"doc_id": [], "score": []})
    else:
        def fn(key, post_pdf):
            import pandas as pd
            r = _score_shard_exhaustive(post_pdf, qmeta, cfgd, k, mode, width)
            return r if r is not None else pd.DataFrame(
                {"doc_id": [], "score": []})

    scored = (post.groupBy("shard")
              .applyInPandas(fn, "doc_id long, score double"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_batch(index, queries: list[dict], k: int = 10) -> DataFrame:
    """E9: execute a whole query set in ONE Spark job.

    ``queries``: [{"id", "query", "mode"}]. One pruned postings scan
    covering the union of all query terms; the per-shard scorer loops the
    queries (each numpy-vectorized); global per-query top-k via window
    rank (single shuffle). Returns (qid, doc_id, score).
    """
    import pandas as pd
    from pyspark.sql import Window
    spark = index.spark
    qtfs = {q["id"]: query_terms(q["query"]) for q in queries}
    modes = {q["id"]: q["mode"].upper() for q in queries}
    all_terms = sorted({t for qt in qtfs.values() for t in qt})
    lex = index.lookup_terms(all_terms)
    # per-query metadata; drop queries that can't match anything
    qmetas = {}
    for qid, qt in qtfs.items():
        known = {t: (lex[t]["idf"], float(n)) for t, n in qt.items() if t in lex}
        if not known:
            continue
        if modes[qid] == "AND" and len(known) < len(qt):
            continue
        qmetas[qid] = known
    if not qmetas:
        return spark.createDataFrame([], "qid string, doc_id long, score double")
    scan_terms = sorted({t for m in qmetas.values() for t in m})
    buckets = sorted({lex[t]["bucket"] for t in scan_terms})
    post = (index.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(scan_terms))
            .select("term", "shard", "df", "doc_ids", "tfs", "dls"))
    width = index.shard_width
    cfgd = {"k1": index.cfg.bm25.k1, "b": index.cfg.bm25.b,
            "avgdl": index.avgdl}

    def fn(key, post_pdf):
        outs = []
        for qid, qmeta in qmetas.items():
            sub = post_pdf[post_pdf["term"].isin(list(qmeta))]
            r = _score_shard_exhaustive(sub, qmeta, cfgd, k,
                                        modes[qid], width)
            if r is not None:
                r.insert(0, "qid", qid)
                outs.append(r)
        return (pd.concat(outs) if outs
                else pd.DataFrame({"qid": [], "doc_id": [], "score": []}))

    scored = (post.groupBy("shard")
              .applyInPandas(fn, "qid string, doc_id long, score double"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn")
            .orderBy("qid", F.desc("score"), F.asc("doc_id")))


def materialize_packed(index, topk: DataFrame) -> DataFrame:
    """E8 for the packed index: join top-k back to the stored corpus."""
    return (index.corpus().join(F.broadcast(topk), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "text", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def materialize(idx: FlatIndex, topk: DataFrame) -> DataFrame:
    """E8: top-k (doc_id, score) -> (doc_id, conv_id, turn_idx, text, score).

    topk is tiny (<= k rows) -> broadcast side of the join against the
    corpus; Catalyst/AQE picks broadcast-hash automatically, we pin it.
    """
    return (idx.docs.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "text", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")))
