"""Frozen engine configuration (SURVEY.md §5.1, §7-M0).

The reference's exact analyzer rules and BM25 constants are not recoverable
(SURVEY.md §0), so this module pins ONE documented choice for each degree of
freedom. Everything that could differ from the reference is a field here so
rank-identity can be re-tuned in minutes if the reference materializes.

Frozen choices
--------------
* analyzer: lowercase + split on non-alphanumeric (``[a-z0-9]+`` findall).
  Identical at build and query time — ranking breaks otherwise.
* BM25: k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))
  (the "Lucene" variant of Okapi idf). Chosen over classic Okapi
  ``ln((N-df+0.5)/(df+0.5))`` because it is strictly positive for every
  df <= N, which keeps Block-Max WAND's max-score upper bounds valid
  (rank-safe pruning) even for terms appearing in >50% of documents —
  the fixtures plant such terms (FIXTURES.md hot0/hot1).
* query-term weighting: weight = qtf (query term frequency); k3 -> inf.
* tie-break: (score desc, doc_id asc) — a total order, required for
  rank-identity comparisons (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --- analyzer -------------------------------------------------------------
# Token pattern applied to LOWERCASED text. Frozen; used by the Spark
# pandas_udf path, the pure-Python oracle, and the DuckDB oracle SQL
# (regexp_extract_all with the same pattern).
TOKEN_PATTERN = r"[a-z0-9]+"


@dataclass(frozen=True)
class AnalyzerConfig:
    """Post-tokenization hooks (SURVEY C3). The spec names none, so the
    DEFAULT is a no-op (identical to r1 behavior); both hooks are real,
    synchronized across all four analyzer forms (pure-Python / pandas /
    Arrow / Spark-expression + DuckDB SQL twin) and rank-identity-tested
    end-to-end when enabled.

    Frozen semantics when enabled:
    * ``stopwords`` are removed FIRST, on the raw lowercase tokens;
    * ``stem='s'`` then applies the light plural stemmer (RE2-safe,
      2 sequential regex rules): ``^(..+)ies$ -> \\1y``, then
      ``^(..+[^aeious])s$ -> \\1`` (never strips -ss/-us/-is/vowel+s);
    * document length ``dl`` counts the tokens actually indexed
      (post-filter), so BM25 length normalization matches the index.
    """
    stopwords: tuple = ()
    stem: str | None = None  # None | 's' (light plural stemmer)

    @property
    def is_noop(self) -> bool:
        return not self.stopwords and self.stem is None


DEFAULT_ANALYZER = AnalyzerConfig()


@dataclass(frozen=True)
class BM25Config:
    k1: float = 1.2
    b: float = 0.75
    # 'lucene': ln(1 + (N-df+0.5)/(df+0.5))  — strictly positive, WAND-safe
    # 'okapi' : ln((N-df+0.5)/(df+0.5))      — classic; negative for df>N/2
    idf_variant: str = "lucene"


@dataclass(frozen=True)
class IndexConfig:
    """Index layout + partitioning knobs (explicit per stage, SURVEY §4)."""

    # postings per block (block-max WAND granularity; P:BMW uses 64-128)
    block_size: int = 128
    # number of term-hash buckets == partition dirs of the index
    # (query-time partition pruning unit)
    n_buckets: int = 16
    # MINIMUM shuffle partitions for the term-partitioned pack stage;
    # the build scales the actual count with the data:
    # max(pack_partitions, fine_slices, est_postings / pack_rows_per_task)
    pack_partitions: int = 32
    # target posting rows per pack/merge task — each task materializes
    # its whole shuffle partition for the vectorized kernel, so this
    # bounds per-task working-set (~2M rows ≈ 50-100 MB) and keeps it
    # cache/bandwidth-friendly at high parallelism at ANY corpus size
    pack_rows_per_task: int = 2_000_000
    # MINIMUM number of doc-range slices the corpus is split into at build
    # time; each slice builds one segment; merge passes reduce segments per
    # (bucket) until <= the effective slice count. Slices are also the
    # query-time scoring shards (all query-term sublists for a doc range
    # co-locate). Sized to the executor-core count (one scoring task per
    # shard at query time; also the salt grain for hot terms in the pack
    # shuffle — more slices = finer skew spread). The EFFECTIVE count is
    # max(n_slices, ceil(n_docs / docs_per_score_shard)) — it grows with
    # the data so per-task scorer memory stays bounded (see below);
    # pack_docs_per_slice bounds per-run build memory independently.
    n_slices: int = 32
    # Hard cap on docs per scoring shard == the width of the dense
    # per-shard accumulators in query.py/wand.py (~21 B/doc across
    # acc+cnt+cand+cum_cand). 2^21 docs -> ~44 MB per scoring task,
    # invariant in corpus size: at 10^11 docs the build resolves ~48k
    # shards instead of widening each one (the pack/merge machinery is
    # width-agnostic). The resolved effective slice count is stored in
    # the manifest and replayed on resume.
    docs_per_score_shard: int = 1 << 21
    # merge fan-in per pass
    merge_fanin: int = 4
    # FORCED number of merge passes, used only when pack_docs_per_slice is
    # None: the pack stage slices the corpus into
    # n_slices * merge_fanin^merge_passes fine doc-range slices (the
    # reference's memory-bounded runs); each pass coarsens by merge_fanin
    # until n_slices scoring shards remain, each (term, shard) one row.
    merge_passes: int = 2
    # memory-bound target: max docs per fine pack slice (a "run" in
    # external-merge terms). When set, the number of merge passes is
    # ADAPTIVE — the smallest p with n_slices * fanin^p slices keeping
    # every slice <= this many docs — exactly how an external merge sort
    # sizes runs to memory and derives its pass count. Small corpora get 0
    # passes (everything fits one run per shard); pass count grows
    # logarithmically with corpus size. None = force merge_passes.
    pack_docs_per_slice: int | None = 65536
    # store a per-posting positions stream (token offsets within each doc,
    # post-analyzer) enabling phrase queries; ~1-2 bytes/token extra index
    # size, zero query-time cost for non-phrase queries (the poss column
    # is simply not selected by their pruned scan)
    index_positions: bool = False
    # docvalue columns: corpus attribute columns stored per scoring shard
    # at build time (engine/docvalues.py — the Lucene "doc values"
    # pattern). Enables query-time dv_filter / recency boost / sort-by-
    # field served INSIDE the scorer task: zero corpus scan, zero extra
    # shuffle. A few bytes/doc/column of index size; empty = off.
    doc_values: tuple = ()
    # additional STRING corpus columns indexed as their own term spaces
    # (the ES/Lucene multi-field pattern): each listed field's tokens are
    # stored as "<field>:<token>" terms in the SAME posting layout (':'
    # can never appear in an analyzer token, so the prefix is
    # unambiguous), with the posting's dls stream carrying THAT FIELD's
    # token count — so per-field BM25 length normalization works from
    # the one segment structure. "text" stays the default unprefixed
    # space (existing queries unchanged). Per-field avgdl is derived
    # from the lexicon (sum of the field's cf / n_docs — corpus-global
    # denominator, frozen and documented vs Lucene's docCount(field))
    # and stored in the manifest. Positions are indexed for the default
    # text field only (phrase queries are text-field queries).
    extra_fields: tuple = ()
    # fuzzy edit-distance neighborhood depth: > 0 writes the SymSpell
    # deletion-variant companion table (engine/fuzzy.py) enabling
    # search_fuzzy up to this many edits. Vocab-scaled index cost
    # (~|lexicon| x (term_len+1) rows at depth 1); 0 = off.
    fuzzy_edits: int = 0
    # skew: terms whose estimated df exceeds this fraction of N get salted
    # across `skew_splits` sub-groups during the pack stage (D8)
    skew_df_frac: float = 0.10
    skew_splits: int = 8
    bm25: BM25Config = field(default_factory=BM25Config)
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)


DEFAULT = IndexConfig()
