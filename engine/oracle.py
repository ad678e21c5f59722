"""Pure-Python single-node BM25 reference scorer (SURVEY.md §5.1).

~100 lines of collections.Counter + math.log — obviously correct by
inspection; no Spark, no numpy. Stands in for the unrecoverable reference
engine: its output on the frozen corpus x frozen query set IS the
rank-identity target the Spark engine must match exactly
(doc_id sequences equal; scores |delta| <= 1e-9).

Summation order: per-doc score accumulates query terms in ascending term
order — the Spark scorer uses the identical order so float64 sums agree
bit-for-bit up to association noise within 1e-9.
"""

from __future__ import annotations

import math
from collections import Counter

from .analyzer import tokenize_py
from .config import DEFAULT_ANALYZER, AnalyzerConfig, BM25Config


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], cfg: BM25Config | None = None,
                 acfg: AnalyzerConfig = DEFAULT_ANALYZER):
        """docs: (doc_id, text) with doc_id dense in stable corpus order.
        ``acfg``: analyzer hooks — must match the engine's index config
        for rank-identity (same contract as the engine itself)."""
        self.cfg = cfg or BM25Config()
        self.acfg = acfg
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.dl: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize_py(text, acfg)
            self.dl[doc_id] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
        self.n_docs = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        x = (self.n_docs - df + 0.5) / (df + 0.5)
        if self.cfg.idf_variant == "lucene":
            return math.log(1.0 + x)
        return math.log(x)  # classic okapi

    def search(self, query: str, k: int = 10, mode: str = "OR",
               min_match: int = 1) -> list[tuple[int, float]]:
        """Exact BM25 top-k; ties broken by ascending doc_id.

        mode=OR: disjunctive. mode=AND: only docs containing ALL distinct
        query terms (conjunctive posting-list intersection). Query-term
        weight = qtf (repeated query terms count multiply).

        ``min_match`` (OR only): minimum_should_match — a doc needs at
        least this many DISTINCT query terms present to qualify (the ES
        bool-query rule; scores of survivors are the plain OR scores).
        """
        qtf = Counter(t for t in tokenize_py(query, self.acfg))
        terms = sorted(qtf)  # ascending term order == frozen summation order
        known = [t for t in terms if t in self.postings]
        if mode.upper() == "AND" and len(known) < len(terms):
            return []  # a required term is absent from the corpus
        scores: dict[int, float] = {}
        seen_count: dict[int, int] = {}
        k1, b = self.cfg.k1, self.cfg.b
        for term in known:
            w_idf = self.idf(term)
            for doc_id, tf in self.postings[term]:
                denom = tf + k1 * (1.0 - b + b * self.dl[doc_id] / self.avgdl)
                s = qtf[term] * w_idf * (tf * (k1 + 1.0)) / denom
                scores[doc_id] = scores.get(doc_id, 0.0) + s
                seen_count[doc_id] = seen_count.get(doc_id, 0) + 1
        if mode.upper() == "AND":
            need = len(known)
            scores = {d: s for d, s in scores.items() if seen_count[d] == need}
        elif min_match > 1:
            scores = {d: s for d, s in scores.items()
                      if seen_count[d] >= min_match}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_bool(self, must: str, should: str = "", k: int = 10,
                    min_should_match: int | None = None,
                    exclude: str | None = None) -> list[tuple[int, float]]:
        """ES bool query (frozen semantics, mirrored by the engine):

        - a doc qualifies iff EVERY distinct ``must`` term is present AND
          at least ``min_should_match`` distinct ``should`` terms are
          present (default 0 when must clauses exist, else 1 — the ES
          default rule) AND no ``exclude`` (must_not) term is present;
        - the score is the plain BM25 OR sum over must UNION should terms
          (both clause kinds contribute; qtf merges by occurrence count
          across both clause texts; a term in both clauses counts as
          must for the arity test);
        - a must term absent from the corpus, or a floor above the number
          of known should terms, makes the result empty.
        """
        m_qtf = Counter(tokenize_py(must, self.acfg))
        s_qtf = Counter(tokenize_py(should, self.acfg))
        must_set = set(m_qtf)
        should_set = set(s_qtf) - must_set
        qtf = m_qtf + s_qtf
        if not qtf:
            return []
        msm = (min_should_match if min_should_match is not None
               else (0 if must_set else 1))
        if must_set - set(self.postings):
            return []  # a required term is absent from the corpus
        known_should = [t for t in should_set if t in self.postings]
        if msm > len(known_should):
            return []
        neg = sorted((set(tokenize_py(exclude, self.acfg)) - set(qtf))
                     if exclude else ())
        banned: set[int] = set()
        for t in neg:
            banned.update(d for d, _ in self.postings.get(t, ()))
        terms = sorted(qtf)
        scores: dict[int, float] = {}
        cnt_must: dict[int, int] = {}
        cnt_should: dict[int, int] = {}
        k1, b = self.cfg.k1, self.cfg.b
        for term in terms:
            if term not in self.postings:
                continue
            w_idf = self.idf(term)
            for doc_id, tf in self.postings[term]:
                denom = tf + k1 * (1.0 - b + b * self.dl[doc_id] / self.avgdl)
                s = qtf[term] * w_idf * (tf * (k1 + 1.0)) / denom
                scores[doc_id] = scores.get(doc_id, 0.0) + s
                tgt = cnt_must if term in must_set else cnt_should
                tgt[doc_id] = tgt.get(doc_id, 0) + 1
        n_must = len(must_set)
        scores = {d: s for d, s in scores.items()
                  if cnt_must.get(d, 0) == n_must
                  and cnt_should.get(d, 0) >= msm
                  and d not in banned}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_boosting(self, positive: str, negative: str,
                        negative_boost: float = 0.5, k: int = 10,
                        mode: str = "OR") -> list[tuple[int, float]]:
        """ES boosting query (frozen semantics, mirrored by the engine's
        query.search_boosting): rank by the positive query's BM25 score,
        multiplying the score of any doc containing ANY negative analyzer
        token by ``negative_boost`` AFTER the frozen summation — the
        identical float64 operation order as the shard kernel."""
        full = self.search(positive, k=self.n_docs, mode=mode)
        dem: set[int] = set()
        for t in set(tokenize_py(negative, self.acfg)):
            dem.update(d for d, _ in self.postings.get(t, ()))
        f = float(negative_boost)
        scored = [(d, s * f if d in dem else s) for d, s in full]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]

    def search_dis_max(self, queries: list, tie_breaker: float = 0.0,
                       k: int = 10,
                       exclude: str | None = None) -> list[tuple[int, float]]:
        """ES dis_max (frozen semantics, mirrored by the engine's
        query.search_dis_max): per doc, s_i = the plain OR BM25 sum of
        subquery i (0.0 when unmatched); total = left-fold of s_i in
        subquery LIST order; score = best + tie * (total - best) — the
        identical float64 expression the shard kernel computes."""
        per = [dict(self.search(q, k=max(self.n_docs, 1), mode="OR"))
               for q in queries]
        union_terms = set()
        for q in queries:
            union_terms.update(tokenize_py(q, self.acfg))
        banned: set[int] = set()
        for t in sorted((set(tokenize_py(exclude, self.acfg)) - union_terms)
                        if exclude else ()):
            banned.update(d for d, _ in self.postings.get(t, ()))
        docs = set()
        for p in per:
            docs.update(p)
        tie = float(tie_breaker)
        out = []
        for d in docs:
            if d in banned:
                continue
            total = per[0].get(d, 0.0)
            best = per[0].get(d, 0.0)
            for p in per[1:]:
                v = p.get(d, 0.0)
                total = total + v
                best = max(best, v)
            out.append((d, best + tie * (total - best)))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]
