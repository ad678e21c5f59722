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


def materialize(idx: FlatIndex, topk: DataFrame) -> DataFrame:
    """E8: top-k (doc_id, score) -> (doc_id, conv_id, turn_idx, text, score).

    topk is tiny (<= k rows) -> broadcast side of the join against the
    corpus; Catalyst/AQE picks broadcast-hash automatically, we pin it.
    """
    return (idx.docs.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "text", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")))
