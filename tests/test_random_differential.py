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


def test_random_scoring_variants_match_oracle(packed_index, oracle_idx):
    """Boosting-query demotion and dis_max under random workloads:
    bit-identical scores vs the oracle twins (both combine AFTER the
    frozen summation, so no rounding tolerance is needed)."""
    from engine import query as Q
    rng = np.random.default_rng(20260819)
    pool = (["hot0", "hot1"] + [f"w{i:03d}" for i in range(2, 60)]
            + [f"rare{i}" for i in range(10)] + ["ghost0"])

    def rand_q(lo=1, hi=4):
        return " ".join(rng.choice(pool, size=int(rng.integers(lo, hi))))

    for case in range(20):
        k = int(rng.integers(1, 15))
        if rng.random() < 0.5:
            pos, neg = rand_q(), rand_q(1, 3)
            f = float(rng.choice([0.0, 0.25, 0.5, 1.0]))
            got = [(r["doc_id"], r["score"]) for r in
                   Q.search_boosting(packed_index, pos, neg, f,
                                     k=k).collect()]
            want = oracle_idx.search_boosting(pos, neg, f, k=k)
            ctx = (case, "boosting", pos, neg, f, k)
        else:
            subs = [rand_q() for _ in range(int(rng.integers(2, 4)))]
            tie = float(rng.choice([0.0, 0.3, 0.7, 1.0]))
            got = [(r["doc_id"], r["score"]) for r in
                   Q.search_dis_max(packed_index, subs, k=k,
                                    tie_breaker=tie).collect()]
            want = oracle_idx.search_dis_max(subs, tie, k=k)
            ctx = (case, "dismax", subs, tie, k)
        assert got == want, ctx
