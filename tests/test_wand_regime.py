"""Block-Max WAND in its design regime (r4): the WAND-fixture corpus
(selective seed + concentrated high-impact docs, uniform dl), min_dl
block bounds, θ refinement, tie-safe top-k, and the batch block decode.

The transcript fixtures exercise WAND's rank SAFETY on hostile (flat-tf)
data; this suite exercises the regime where pruning actually bites —
including exact float-score TIES across the whole gold set, which is
what caught the k-boundary argpartition bug (codec.topk_tiebreak)."""

import numpy as np
import pytest

from engine import codec
from engine.fixtures import make_wand_corpus, spark_wand_corpus, wand_query


def test_topk_tiebreak_unit():
    ids = np.array([50, 10, 30, 20, 40, 60], dtype=np.int64)
    scores = np.array([1.0, 1.0, 2.0, 1.0, 1.0, 0.5])
    out_ids, out_sc = codec.topk_tiebreak(ids, scores, 3)
    # score desc, id asc — ALL four 1.0-ties considered, lowest ids win
    assert out_ids.tolist() == [30, 10, 20]
    assert out_sc.tolist() == [2.0, 1.0, 1.0]
    # k >= size: full ordered result
    out_ids, _ = codec.topk_tiebreak(ids, scores, 99)
    assert out_ids.tolist() == [30, 10, 20, 40, 50, 60]


@pytest.fixture(scope="module")
def wand_setup(spark, tmp_path_factory):
    from engine.build import build_index
    from engine.config import IndexConfig
    from engine.oracle import OracleIndex
    n = 20000
    pdf = make_wand_corpus(n)
    oidx = OracleIndex(list(zip(range(n), pdf.text)))
    d = str(tmp_path_factory.mktemp("wand") / "idx")
    idx = build_index(spark, spark_wand_corpus(spark, n, n_parts=6), d,
                      IndexConfig(n_slices=1, block_size=32))
    return pdf, oidx, idx


def test_wand_regime_rank_identity(wand_setup):
    """Forced WAND == exhaustive == oracle on the WAND-regime corpus —
    the gold docs all tie EXACTLY (uniform construction), so this pins
    the tie-safe top-k through every scorer path."""
    from engine import query as Q
    pdf, oidx, idx = wand_setup
    q = wand_query()
    want = [(d, round(s, 9)) for d, s in oidx.search(q, 10, "OR")]
    for uw in (True, False):
        got = [(r.doc_id, round(r.score, 9))
               for r in Q.search(idx, q, 10, "OR", use_wand=uw).collect()]
        assert got == want, uw
    # masked WAND under the same ties
    want_all = [(d, round(s, 9)) for d, s in oidx.search(q, 20000, "OR")]
    want_m = [(d, s) for d, s in want_all if d % 2 == 0][:10]
    got = [(r.doc_id, round(r.score, 9))
           for r in Q.search(idx, q, 10, "OR", use_wand=True,
                             doc_filter="role = 'user'").collect()]
    assert got == want_m


def test_wand_prunes_in_regime(wand_setup):
    """The design claim, measured at the kernel: in the WAND regime the
    pruned scorer decodes a small fraction of the posting mass. Asserted
    via the candidate count implied by phase 3 — we re-run the scorer's
    bound arithmetic and require the surviving-block posting mass to be
    < 10% of the total (gold-bearing blocks only)."""
    from pyspark.sql import functions as F

    from engine import query as Q
    from engine.wand import _blk, _ub
    pdf, oidx, idx = wand_setup
    q = wand_query()
    qt = Q.query_terms(q)
    lex = idx.lookup_terms(sorted(qt))
    idfs = {t: float(lex[t]["idf"]) for t in lex}
    buckets = sorted({lex[t]["bucket"] for t in lex})
    post = (idx.postings()
            .filter(F.col("bucket").isin(buckets)
                    & F.col("term").isin(sorted(qt)))
            .select("term", "df", "blocks").toPandas())
    k1, b, avgdl = idx.cfg.bm25.k1, idx.cfg.bm25.b, idx.avgdl
    # exact θ: every gold doc scores identically; compute from the oracle
    theta = oidx.search(q, 10, "OR")[-1][1]
    ubg, bubs, ns = {}, [], []
    for i in range(len(post)):
        blocks = codec.decode_blocks(post["blocks"].iloc[i])
        bub = _ub(_blk(blocks, "max_tf"), idfs[post["term"].iloc[i]],
                  float(qt[post["term"].iloc[i]]), k1, b,
                  _blk(blocks, "min_dl"), avgdl)
        bubs.append(bub)
        ns.append(_blk(blocks, "n"))
        ubg[post["term"].iloc[i]] = float(bub.max())
    ub_total = sum(ubg.values())
    total_mass = survive_mass = 0
    for i in range(len(post)):
        rest = ub_total - ubg[post["term"].iloc[i]]
        keep = bubs[i] + rest >= theta - 1e-9 * theta
        total_mass += int(ns[i].sum())
        survive_mass += int(ns[i][keep].sum())
    assert survive_mass < 0.10 * total_mass, (survive_mass, total_mass)


def test_wand_gate_routes_in_regime(spark, wand_setup):
    """wand_routes() must be False on the small test corpus (mass below
    the per-shard bar) and True once the shard mass clears it — the
    bench asserts the True case on the full-size corpus."""
    from engine import query as Q
    pdf, oidx, idx = wand_setup
    # 20k-doc corpus: mass ~68k < 2^18 -> exhaustive
    assert Q.wand_routes(idx, wand_query()) is False
    # single-term: never routes
    assert Q.wand_routes(idx, "h0") is False


def test_min_dl_blocks_on_transcripts(spark, corpus_df):
    """min_dl rides every layout: on the variable-length transcript
    corpus each block's min_dl is a true lower bound and some blocks
    differ (non-degenerate)."""
    from engine.build import build_index
    import tempfile
    d = tempfile.mkdtemp(prefix="mindl_")
    idx = build_index(spark, corpus_df, f"{d}/idx")
    rows = spark.read.parquet(idx.postings_path).limit(50).collect()
    seen = set()
    for r in rows:
        blocks = codec.decode_blocks(bytes(r["blocks"]))
        dls = codec.vbyte_decode(bytes(r["dls"])).astype(np.int64)
        for bl in blocks:
            seg = dls[bl["off"]:bl["off"] + bl["n"]]
            assert int(seg.min()) == bl["min_dl"]
            seen.add(int(bl["min_dl"]))
    assert len(seen) > 1  # variable-length corpus -> varying min_dl


def test_distributed_gen_matches_pandas_twin(spark):
    """spark_wand_corpus (per-partition _wand_rows chunks) must be
    byte-identical to make_wand_corpus at ANY partition count — the
    hash-per-doc construction's whole contract (r4: the bench corpus is
    generated distributed; the oracle reads the pandas twin)."""
    n = 3001  # awkward size: uneven chunk bounds
    pdf = make_wand_corpus(n, n_hot=10).sort_values("conv_id")
    for parts in (5, 11):
        sdf = (spark_wand_corpus(spark, n, n_parts=parts, n_hot=10)
               .toPandas().sort_values("conv_id"))
        assert sdf["text"].tolist() == pdf["text"].tolist()
        assert sdf["role"].tolist() == pdf["role"].tolist()
        assert sdf["ts"].tolist() == pdf["ts"].tolist()
    assert all(len(t.split()) == 64 for t in pdf["text"])
