"""Index build pipeline (SURVEY.md §2.B-D, §3 entry point 1).

M1 layer: corpus -> deterministic doc_ids -> flat postings IR
``(doc_id, term, tf, dl)`` + docmap + lexicon + corpus stats, all as
DataFrames. The packed/compressed segment index (M2+) builds on top of the
same flat IR.

Scale notes (100 TB design):
* Tokenization is ONE ``mapInArrow`` pass; it emits posting rows AND one
  sentinel row per document (term=NULL) carrying (conv_id, turn_idx, dl),
  so the docmap falls out of the same pass with no second tokenization and
  no extra shuffle — both outputs inherit the doc-range partitioning.
* All counting per document happens inside the Arrow batch (pandas C
  groupby); nothing per-row in Python.
* Lexicon/stats are classic partial+final hash aggregations (Catalyst
  splits them automatically — map-side combine before the shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .analyzer import doc_term_freqs
from .config import DEFAULT, IndexConfig
from .docids import assign_doc_ids

_TOKENIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("term", T.StringType(), True),   # NULL on docmap sentinel rows
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("dl", T.IntegerType(), False),
])


def tokenize_corpus(docs: DataFrame) -> DataFrame:
    """(..., doc_id, conv_id, turn_idx, text) -> flat postings IR + sentinels.

    Output: one row per (doc, term) with tf and dl, plus one term=NULL row
    per doc carrying (conv_id, turn_idx, dl) for the docmap.
    """

    names = [f.name for f in _TOKENIZED_SCHEMA.fields]

    def fn(batches):
        for b in batches:
            texts = b.column("text").to_pandas()
            doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            conv = b.column("conv_id").cast(pa.string())
            turn = b.column("turn_idx").cast(pa.int32())
            rows, terms, tfs, dl = doc_term_freqs(texts)
            n = b.num_rows
            npost = rows.size
            cols = [
                pa.array(np.concatenate([doc_ids[rows], doc_ids]), pa.int64()),
                pa.concat_arrays([pa.nulls(npost, pa.string()), conv]),
                pa.concat_arrays([pa.nulls(npost, pa.int32()), turn]),
                pa.concat_arrays([pa.array(terms, pa.string()),
                                  pa.nulls(n, pa.string())]),
                pa.array(np.concatenate([tfs, np.zeros(n, np.int64)])
                         .astype(np.int32), pa.int32()),
                pa.array(np.concatenate([dl[rows], dl]).astype(np.int32),
                         pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return docs.select("doc_id", "conv_id", "turn_idx", "text").mapInArrow(
        fn, _TOKENIZED_SCHEMA)


@dataclass
class FlatIndex:
    """M1 in-memory index: flat postings + docmap + lexicon + stats."""
    docs: DataFrame        # corpus columns + doc_id
    postings: DataFrame    # doc_id, term, tf, dl
    docmap: DataFrame      # doc_id, conv_id, turn_idx, dl
    lexicon: DataFrame     # term, df, cf, max_tf, idf
    n_docs: int
    avgdl: float
    cfg: IndexConfig


def idf_col(df_col, n_docs: int, variant: str):
    """BM25 idf as a Spark Column (must mirror oracle.OracleIndex.idf)."""
    x = (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    return F.log(F.lit(1.0) + x) if variant == "lucene" else F.log(x)


def build_flat_index(spark: SparkSession, corpus: DataFrame,
                     cfg: IndexConfig = DEFAULT,
                     n_parts: int | None = None) -> FlatIndex:
    docs = assign_doc_ids(corpus, n_parts=n_parts)
    docs.persist(StorageLevel.MEMORY_AND_DISK)
    tokenized = tokenize_corpus(docs).persist(StorageLevel.MEMORY_AND_DISK)
    postings = tokenized.filter(F.col("term").isNotNull()).select(
        "doc_id", "term", "tf", "dl")
    docmap = tokenized.filter(F.col("term").isNull()).select(
        "doc_id", "conv_id", "turn_idx", "dl")
    n_docs, sum_dl = docmap.agg(F.count("*"), F.sum("dl")).first()
    avgdl = (sum_dl or 0) / n_docs if n_docs else 0.0
    lexicon = (postings.groupBy("term")
               .agg(F.count("*").alias("df"),
                    F.sum("tf").alias("cf"),
                    F.max("tf").alias("max_tf"))
               .withColumn("idf", idf_col(F.col("df"), n_docs, cfg.bm25.idf_variant)))
    return FlatIndex(docs=docs, postings=postings, docmap=docmap,
                     lexicon=lexicon, n_docs=int(n_docs), avgdl=float(avgdl),
                     cfg=cfg)
