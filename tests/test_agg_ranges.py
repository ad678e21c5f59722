"""Range aggregation (engine/matchops.py match_ranges) and terms+stats
sub-aggregation (facet_stats) over the match set, cross-checked against a
pandas recomputation from the raw fixture corpus."""

import datetime
from collections import Counter

import numpy as np
import pytest

from engine.analyzer import tokenize_py
from engine.config import IndexConfig
from engine.matchops import facet_stats, match_ranges


@pytest.fixture(scope="module")
def dv_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("idx_aggr") / "packed")
    return build_index(spark, corpus_df, d,
                       cfg=IndexConfig(doc_values=("role", "ts")))


@pytest.fixture(scope="module")
def ref(corpus_pdf, dv_index):
    acfg = dv_index.cfg.analyzer
    toks = [set(tokenize_py(t, acfg)) for t in corpus_pdf.text]
    secs = corpus_pdf.ts.map(
        lambda t: int(t.replace(tzinfo=datetime.timezone.utc).timestamp()))
    return toks, secs


def test_match_ranges_vs_pandas(dv_index, corpus_pdf, ref):
    toks, secs = ref
    match = [i for i, s in enumerate(toks) if "hot0" in s]
    edges = sorted(set(np.percentile(secs, [25, 50, 75])
                       .astype(int).tolist()))
    got = {(r["lo"], r["hi"]): r["n_docs"]
           for r in match_ranges(dv_index, "hot0", "ts", edges).collect()}
    b = np.searchsorted(np.asarray(edges),
                        secs.iloc[match].to_numpy(), side="right")
    want = {}
    for i, c in Counter(b.tolist()).items():
        want[(edges[i - 1] if i > 0 else None,
              edges[i] if i < len(edges) else None)] = c
    assert got == want


def test_match_ranges_ordered_and_composes_exclude(dv_index, ref):
    toks, secs = ref
    edges = [int(secs.median())]
    rows = match_ranges(dv_index, "hot0", "ts", edges,
                        exclude="hot1").collect()
    # ordered by bucket position: (-inf, e) before [e, +inf)
    assert [r["lo"] for r in rows] == sorted(
        (r["lo"] for r in rows), key=lambda x: (x is not None, x))
    match = [i for i, s in enumerate(toks)
             if "hot0" in s and "hot1" not in s]
    assert sum(r["n_docs"] for r in rows) == len(match)


def test_match_ranges_rejects_bad_edges(dv_index):
    with pytest.raises(ValueError, match="sorted"):
        match_ranges(dv_index, "hot0", "ts", [5, 3])
    with pytest.raises(ValueError, match="sorted"):
        match_ranges(dv_index, "hot0", "ts", [])
    with pytest.raises(ValueError, match="docvalue"):
        match_ranges(dv_index, "hot0", "nope", [1])


def test_facet_stats_vs_pandas(dv_index, corpus_pdf, ref):
    toks, secs = ref
    match = [i for i, s in enumerate(toks) if "hot0" in s]
    want: dict = {}
    for i in match:
        want.setdefault(corpus_pdf.role.iloc[i], []).append(int(secs.iloc[i]))
    rows = facet_stats(dv_index, "hot0", "role", "ts").collect()
    assert len(rows) == len(want)
    # presentation order: n_docs desc, facet_value asc
    assert [r["facet_value"] for r in rows] == \
        sorted(want, key=lambda g: (-len(want[g]), g))
    for r in rows:
        v = want[r["facet_value"]]
        assert r["n_docs"] == len(v) == r["n_with_value"]
        assert r["min_val"] == min(v) and r["max_val"] == max(v)
        assert r["sum_val"] == sum(v)
        assert abs(r["avg_val"] - sum(v) / len(v)) <= 1e-9


def test_facet_stats_and_mode(dv_index, corpus_pdf, ref):
    toks, secs = ref
    match = [i for i, s in enumerate(toks)
             if "hot0" in s and "w020" in s]
    rows = facet_stats(dv_index, "hot0 w020", "role", "ts",
                       mode="AND").collect()
    assert sum(r["n_docs"] for r in rows) == len(match)


def test_facet_stats_rejects_float_stat(dv_index):
    with pytest.raises(ValueError, match="docvalue"):
        facet_stats(dv_index, "hot0", "role", "nope")
