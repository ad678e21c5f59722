"""Skew handling (SURVEY.md D8, §5.6): a term in ~100% of docs (hot0 in
the skewed fixture appears in >97% + forced into 50% with tf>=3) must
(a) still produce rank-identical results and (b) be SPLIT across
(term, shard) groups so no single pack/score task owns the whole list —
the doc-range-shard salting argument, verified from the index itself."""

import numpy as np

from engine import query as Q
from engine.build import build_index
from engine.fixtures import make_transcripts, spark_transcripts
from engine.oracle import OracleIndex


def test_skewed_corpus_rank_identity_and_split(spark, tmp_path):
    pdf = make_transcripts(800, skew=True)
    corpus = spark_transcripts(spark, 800, skew=True, n_parts=6)
    idx = build_index(spark, corpus, str(tmp_path / "skewidx"))
    oracle = OracleIndex(list(zip(range(len(pdf)), pdf.text)))

    # (a) rank identity on hot-term queries: forced-exhaustive, forced-
    # WAND, and the default cost-gated "auto" routing must all agree
    for query, mode in [("hot0", "OR"), ("hot0 hot1", "AND"),
                        ("hot0 rare3", "OR")]:
        want = [(d, round(s, 9)) for d, s in oracle.search(query, 10, mode)]
        for wand in (False, True, "auto"):
            got = [(r.doc_id, round(r.score, 9)) for r in
                   Q.search(idx, query, 10, mode, use_wand=wand).collect()]
            assert got == want, (query, mode, wand)

    # (b) the hot list is salted across shards; each group bounded by the
    # shard width (the explicit D8 guarantee), not by the term's df
    rows = (spark.read.parquet(idx.postings_path)
            .filter("term = 'hot0'").select("shard", "df").collect())
    assert len(rows) > 1, "hot term must span multiple (term, shard) groups"
    dfs = np.array([r.df for r in rows])
    assert dfs.max() <= idx.shard_width
    total_hot = int(dfs.sum())
    assert total_hot == len(oracle.postings["hot0"])
    # no group more than 2x the mean group size (task-balance criterion)
    assert dfs.max() <= 2 * dfs.mean() + 1
