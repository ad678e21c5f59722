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


@pytest.fixture(scope="module")
def dv_packed_index(spark, corpus_df, tmp_path_factory):
    from engine.build import build_index
    from engine.config import IndexConfig
    d = str(tmp_path_factory.mktemp("rdiff_dv") / "packed")
    return build_index(spark, corpus_df, d,
                       cfg=IndexConfig(doc_values=("role", "ts")))


def test_random_decay_boosts_match_recompute(dv_packed_index, oracle_idx,
                                             corpus_pdf):
    """Decay-function boosts (gauss/exp/linear + the legacy half-life)
    under random parameters: ranking == unboosted full ranking x the
    frozen multiplier, recomputed in pure Python."""
    import datetime
    import math

    from engine import query as Q
    rng = np.random.default_rng(20260821)
    pool = ["hot0", "hot1"] + [f"w{i:03d}" for i in range(2, 40)]
    epoch = [ts.replace(tzinfo=datetime.timezone.utc).timestamp()
             for ts in (t.to_pydatetime() for t in corpus_pdf.ts)]
    t_lo, t_hi = min(epoch), max(epoch)

    def mult(kind, x, origin, scale, d, off):
        if kind == "recency":
            return 0.5 ** (max(0.0, origin - x) / scale)
        dist = max(0.0, abs(x - origin) - off)
        if kind == "gauss":
            return math.exp(-(dist * dist)
                            / (2.0 * (-(scale * scale)
                                      / (2.0 * math.log(d)))))
        if kind == "exp":
            return math.exp(math.log(d) / scale * dist)
        s = scale / (1.0 - d)
        return max(0.0, (s - dist) / s)

    for case in range(12):
        q = " ".join(rng.choice(pool, size=int(rng.integers(1, 4))))
        k = int(rng.integers(1, 12))
        kind = str(rng.choice(["gauss", "exp", "linear", "recency"]))
        origin = float(t_lo + rng.random() * (t_hi - t_lo))
        scale_days = float(rng.choice([0.05, 0.2, 0.5]))
        d = float(rng.choice([0.3, 0.5, 0.8]))
        off_days = float(rng.choice([0.0, 0.02]))
        if kind == "recency":
            boost = {"field": "ts", "half_life_days": scale_days,
                     "now": origin}
        else:
            boost = {"field": "ts", "decay": kind, "origin": origin,
                     "scale_days": scale_days, "decay_value": d,
                     "offset_days": off_days}
        full = oracle_idx.search(q, k=oracle_idx.n_docs, mode="OR")
        want = sorted(
            ((doc, s * mult(kind, epoch[doc], origin,
                            scale_days * 86400.0, d, off_days * 86400.0))
             for doc, s in full),
            key=lambda t: (-t[1], t[0]))[:k]
        got = [(r["doc_id"], r["score"]) for r in
               Q.search(dv_packed_index, q, k=k, boost=boost).collect()]
        ctx = (case, kind, q, k, origin, scale_days, d, off_days)
        assert [x for x, _ in got] == [x for x, _ in want], ctx
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, ctx
