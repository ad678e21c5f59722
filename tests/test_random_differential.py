"""Seeded randomized differential test (SURVEY.md §5): random query
workloads — term mixes across the Zipf head/body/tail plus unknown
terms, OR/AND modes, NOT excludes, doc_filter restriction, and all
three WAND routings — must match the pure-Python oracle exactly.

Deterministic (fixed seed) so failures reproduce; the expected result
is derived from the oracle's FULL ranking with exclusion/filtering
applied by the frozen contracts (global BM25 stats; excluded docs and
filter-rejected docs removed before the k-cut).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    d = str(tmp_path_factory.mktemp("rdiff") / "packed")
    return build_index(spark, corpus_df, d)


def _expected(oracle_idx, corpus_pdf, query, mode, k,
              exclude=None, role_filter=None):
    from engine.analyzer import tokenize_py
    full = oracle_idx.search(query, k=oracle_idx.n_docs, mode=mode)
    drop = set()
    if exclude:
        pos = set(tokenize_py(query, oracle_idx.acfg))
        for t in set(tokenize_py(exclude, oracle_idx.acfg)) - pos:
            drop |= {d for d, _ in oracle_idx.postings.get(t, ())}
    allowed = None
    if role_filter is not None:
        allowed = set(np.flatnonzero(
            (corpus_pdf["role"] == role_filter).to_numpy()))
    out = [(d, round(s, 9)) for d, s in full
           if d not in drop and (allowed is None or d in allowed)]
    return out[:k]


def test_random_workload_matches_oracle(packed_index, oracle_idx,
                                        corpus_pdf):
    from engine import query as Q
    rng = np.random.default_rng(20260817)
    pool = (["hot0", "hot1"] + [f"w{i:03d}" for i in range(2, 60)]
            + [f"rare{i}" for i in range(10)] + ["ghost0", "ghost1"])
    n_checked = 0
    for case in range(30):
        terms = list(rng.choice(pool, size=int(rng.integers(1, 5))))
        query = " ".join(terms)
        mode = "AND" if rng.random() < 0.3 else "OR"
        exclude = (" ".join(rng.choice(pool, size=int(rng.integers(1, 3))))
                   if rng.random() < 0.3 else None)
        role = (str(rng.choice(["user", "assistant"]))
                if rng.random() < 0.3 else None)
        use_wand = [True, False, "auto"][int(rng.integers(3))]
        if use_wand is True and mode != "OR":
            use_wand = "auto"
        k = int(rng.integers(1, 15))
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               Q.search(packed_index, query, k=k, mode=mode,
                        use_wand=use_wand, exclude=exclude,
                        doc_filter=(f"role = '{role}'" if role else None)
                        ).collect()]
        want = _expected(oracle_idx, corpus_pdf, query, mode, k,
                         exclude=exclude, role_filter=role)
        ctx = (case, query, mode, exclude, role, use_wand, k)
        assert got == want, ctx
        n_checked += 1
    assert n_checked == 30
