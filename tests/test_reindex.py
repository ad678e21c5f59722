"""reindex (engine/build.py): rebuild under a new IndexConfig from the
stored corpus — the ES _reindex / mapping-change operation."""

import pytest

from engine import query as Q
from engine.build import build_index, reindex
from engine.config import AnalyzerConfig, IndexConfig
from engine.fixtures import QUERY_SET, make_transcripts, spark_transcripts
from engine.oracle import OracleIndex

HOOKED = AnalyzerConfig(stopwords=("w000", "w001"), stem="s")


def test_reindex_hooked_analyzer_matches_fresh_build(spark, tmp_path):
    """reindex(new analyzer) ranks identically to a fresh build over the
    ORIGINAL source with that analyzer — and to the hooked oracle."""
    pdf = make_transcripts(200)
    df = spark_transcripts(spark, 200)
    base = build_index(spark, df, str(tmp_path / "base"))
    re_idx = reindex(base, str(tmp_path / "re"),
                     IndexConfig(analyzer=HOOKED))
    oracle = OracleIndex(list(zip(range(len(pdf)), pdf.text)),
                         acfg=HOOKED)
    for q in QUERY_SET[:6]:
        want = oracle.search(q["query"], k=10, mode=q["mode"])
        got = [(r.doc_id, r.score) for r in
               Q.search(re_idx, q["query"], k=10, mode=q["mode"],
                        use_wand=False).collect()]
        assert got == want, q["id"]


def test_reindex_adds_positions_and_docvalues(spark, tmp_path):
    """Turning on positions + a docvalue store via reindex enables the
    phrase and dv_filter paths on a corpus indexed without them."""
    df = spark_transcripts(spark, 150)
    base = build_index(spark, df, str(tmp_path / "b2"))
    with pytest.raises(ValueError, match="positions"):
        Q.search_phrase(base, "hot0 hot1")
    re_idx = reindex(base, str(tmp_path / "r2"),
                     IndexConfig(index_positions=True,
                                 doc_values=("role", "ts")))
    assert Q.search_phrase(re_idx, "hot0 hot1", k=5).count() > 0
    assert Q.search(re_idx, "hot0", k=5,
                    dv_filter="role = 'user'").count() > 0
    # doc_ids identical to the base build (same canonical sort)
    a = [(r.doc_id, r.score) for r in Q.search(base, "hot0 hot1",
                                               k=10).collect()]
    b = [(r.doc_id, r.score) for r in Q.search(re_idx, "hot0 hot1",
                                               k=10).collect()]
    assert a == b


def test_reindex_refuses_tombstones(spark, tmp_path):
    from engine.deletes import delete_docs
    df = spark_transcripts(spark, 100)
    base = build_index(spark, df, str(tmp_path / "b3"),
                       cfg=IndexConfig(doc_values=("role",)))
    delete_docs(base, "role = 'tool'")
    with pytest.raises(ValueError, match="purge_deletes first"):
        reindex(base, str(tmp_path / "r3"))


def test_snapshot_preserves_everything(spark, tmp_path):
    """snapshot/restore: rankings, tombstones and the phrase path
    survive the copy; later mutation of the source leaves it intact."""
    from engine.build import snapshot
    from engine.deletes import delete_docs, purge_deletes
    df = spark_transcripts(spark, 150)
    src = build_index(spark, df, str(tmp_path / "src"),
                      cfg=IndexConfig(index_positions=True,
                                      doc_values=("role",)))
    delete_docs(src, "role = 'tool'")
    want = [(r.doc_id, r.score) for r in
            Q.search(src, "hot0 hot1", k=10).collect()]
    wantp = [(r.doc_id, r.n_phrase) for r in
             Q.search_phrase(src, "hot0 hot1", k=10).collect()]
    snap = snapshot(src, str(tmp_path / "snap"))
    got = [(r.doc_id, r.score) for r in
           Q.search(snap, "hot0 hot1", k=10).collect()]
    gotp = [(r.doc_id, r.n_phrase) for r in
            Q.search_phrase(snap, "hot0 hot1", k=10).collect()]
    assert got == want and gotp == wantp
    # mutate the SOURCE: purge — the snapshot still serves the
    # tombstoned-but-unpurged state
    purge_deletes(src)
    got2 = [(r.doc_id, r.score) for r in
            Q.search(snap, "hot0 hot1", k=10).collect()]
    assert got2 == want
    with pytest.raises(ValueError, match="destination exists"):
        snapshot(snap, str(tmp_path / "snap"))


def test_snapshot_refuses_pending_appends(spark, tmp_path):
    from engine.build import snapshot
    from engine.streaming import append_batch
    df = spark_transcripts(spark, 80)
    idx = build_index(spark, df, str(tmp_path / "sa"))
    extra = spark_transcripts(spark, 10, seed=7)
    append_batch(spark, extra, str(tmp_path / "sa"))
    with pytest.raises(ValueError, match="pending compaction"):
        snapshot(idx, str(tmp_path / "sb"))
