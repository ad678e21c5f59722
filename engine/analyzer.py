"""Frozen text analyzer (SURVEY.md C1/C2): lowercase + ``[a-z0-9]+`` findall.

Three synchronized implementations of the SAME analysis — build-time Spark,
query-time driver, and oracle SQL — kept in one module so they cannot drift:

* :func:`tokenize_py` — pure Python, used by the oracle and for query strings.
* :func:`tokenize_series` — vectorized pandas, used inside Arrow UDFs.
* :func:`tokenize_expr` / :data:`DUCKDB_TOKENIZE` — Spark Column / DuckDB SQL
  expression forms for the SQL-expressible oracle path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .config import DEFAULT_ANALYZER, AnalyzerConfig, TOKEN_PATTERN

_RX = re.compile(TOKEN_PATTERN)

# light plural stemmer (AnalyzerConfig.stem == 's'): two SEQUENTIAL
# RE2-safe rules (no lookbehind — portable across Python re, RE2
# (Arrow/DuckDB), and Java regex (Spark)); rule 1's output ends in 'y'
# so rule 2 never double-fires.
_STEM_RULES = [(r"^(..+)ies$", r"\1y"), (r"^(..+[^aeious])s$", r"\1")]
_STEM_RX = [(re.compile(p), r) for p, r in _STEM_RULES]


def _stem_py(tok: str) -> str:
    for rx, repl in _STEM_RX:
        tok = rx.sub(repl, tok)
    return tok


def tokenize_py(text: str, acfg: AnalyzerConfig = DEFAULT_ANALYZER) -> list[str]:
    toks = _RX.findall(text.lower()) if text else []
    if acfg.is_noop:
        return toks
    if acfg.stopwords:
        sw = set(acfg.stopwords)
        toks = [t for t in toks if t not in sw]
    if acfg.stem == "s":
        toks = [_stem_py(t) for t in toks]
    return toks


def tokenize_series(texts: pd.Series) -> pd.Series:
    """text -> list[str] per row, vectorized (pandas C string kernels).
    RAW tokens only — the config hooks apply on the exploded flat stream
    in doc_term_freqs (vectorized), never per-list."""
    return texts.fillna("").str.lower().str.findall(_RX)


def doc_term_freqs(texts: pd.Series, acfg: AnalyzerConfig = DEFAULT_ANALYZER):
    """Vectorized per-document term frequencies for one Arrow batch.

    Returns ``(row_idx:int64[], term:object[], tf:int64[], dl:int64[nrows])``
    where ``row_idx`` indexes into the input batch. No per-row Python loop:
    token lists are exploded with ``np.repeat`` + ``np.concatenate`` and
    counted with a single pandas groupby (C hash aggregation). Config
    hooks (stopwords/stem) apply vectorized on the exploded flat stream;
    ``dl`` counts post-filter tokens (the tokens actually indexed).
    """
    toks = tokenize_series(texts)
    toks.index = pd.RangeIndex(len(toks))
    n = len(texts)
    raw_dl = toks.str.len().to_numpy(dtype=np.int64)
    if n == 0 or raw_dl.sum() == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), raw_dl)
    flat = toks.explode().dropna()  # index = source row, values = tokens
    if acfg.stopwords:
        flat = flat[~flat.isin(set(acfg.stopwords))]
    if acfg.stem == "s":
        for pat, repl in _STEM_RULES:
            flat = flat.str.replace(pat, repl, regex=True)
    if acfg.is_noop:
        dl = raw_dl
    else:
        dl = np.bincount(flat.index.to_numpy(np.int64),
                         minlength=n).astype(np.int64)
    if len(flat) == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), dl)
    g = pd.DataFrame({"r": flat.index.to_numpy(np.int64),
                      "t": flat.to_numpy(object)}).groupby(
        ["r", "t"], sort=False, observed=True).size()
    idx = g.index
    return (idx.get_level_values(0).to_numpy(np.int64),
            idx.get_level_values(1).to_numpy(object),
            g.to_numpy(np.int64), dl)


def doc_term_freqs_arrow(arr, acfg: AnalyzerConfig = DEFAULT_ANALYZER):
    """Arrow-native fast path of :func:`doc_term_freqs` (same return shape,
    input is a ``pa.Array`` of strings).

    Uses RE2 kernels (``split_pattern_regex`` on the complement class) +
    dictionary-encode + one ``np.unique`` — no Python regex loop. Only
    taken when the whole batch is ASCII: full-Unicode case mapping can
    differ between Python ``str.lower`` and Arrow ``utf8_lower`` (e.g.
    U+0130 İ), and the analyzer is frozen to the Python semantics; non-ASCII
    batches fall back to :func:`doc_term_freqs`.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), np.zeros(0, np.int64))
    if not pc.min(pc.string_is_ascii(pc.fill_null(arr, ""))).as_py():
        return doc_term_freqs(arr.to_pandas(), acfg)
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z0-9]+")
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    mask = pc.not_equal(flat, "")
    if acfg.stopwords:
        mask = pc.and_(mask, pc.invert(pc.is_in(
            flat, value_set=pa.array(sorted(acfg.stopwords)))))
    flat, parents = flat.filter(mask), parents.filter(mask)
    if acfg.stem == "s":
        for pat, repl in _STEM_RULES:  # RE2 rewrite syntax is \1, as-is
            flat = pc.replace_substring_regex(flat, pat, repl)
    pn = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    dl = np.bincount(pn, minlength=len(arr)).astype(np.int64)
    if pn.size == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), dl)
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = de.dictionary
    v = len(vocab)
    key = pn * v + codes
    uk, counts = np.unique(key, return_counts=True)
    terms = vocab.take(pa.array(uk % v)).to_numpy(zero_copy_only=False)
    return uk // v, terms, counts.astype(np.int64), dl


def doc_token_positions(texts: pd.Series, acfg: AnalyzerConfig = DEFAULT_ANALYZER):
    """Vectorized per-occurrence token stream for one batch (positions
    variant of :func:`doc_term_freqs` — used when the index stores a
    positions stream for phrase queries).

    Returns ``(row_idx:int64[], term:object[], pos:int64[], dl:int64[nrows])``
    with ONE entry per token OCCURRENCE (not per (doc, term) pair).
    ``pos`` is the token's index within its document counted over the
    tokens actually indexed (post-stopword/stem — the frozen choice:
    phrase adjacency is defined on the indexed token stream, matching how
    ``dl`` counts indexed tokens)."""
    toks = tokenize_series(texts)
    toks.index = pd.RangeIndex(len(toks))
    n = len(texts)
    raw_dl = toks.str.len().to_numpy(dtype=np.int64)
    if n == 0 or raw_dl.sum() == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), raw_dl)
    flat = toks.explode().dropna()
    if acfg.stopwords:
        flat = flat[~flat.isin(set(acfg.stopwords))]
    if acfg.stem == "s":
        for pat, repl in _STEM_RULES:
            flat = flat.str.replace(pat, repl, regex=True)
    rows = flat.index.to_numpy(np.int64)
    dl = (raw_dl if acfg.is_noop
          else np.bincount(rows, minlength=n).astype(np.int64))
    if rows.size == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), dl)
    # position within doc: occurrence index minus the doc's start offset
    # (rows is non-decreasing — explode preserves row order)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(dl[:-1], out=starts[1:])
    pos = np.arange(rows.size, dtype=np.int64) - starts[rows]
    return rows, flat.to_numpy(object), pos, dl


def doc_token_positions_arrow(arr, acfg: AnalyzerConfig = DEFAULT_ANALYZER):
    """Arrow-native fast path of :func:`doc_token_positions` (RE2 kernels,
    ASCII-gated exactly like :func:`doc_term_freqs_arrow`)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(arr) == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), np.zeros(0, np.int64))
    if not pc.min(pc.string_is_ascii(pc.fill_null(arr, ""))).as_py():
        return doc_token_positions(arr.to_pandas(), acfg)
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z0-9]+")
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    mask = pc.not_equal(flat, "")
    if acfg.stopwords:
        mask = pc.and_(mask, pc.invert(pc.is_in(
            flat, value_set=pa.array(sorted(acfg.stopwords)))))
    flat, parents = flat.filter(mask), parents.filter(mask)
    if acfg.stem == "s":
        for pat, repl in _STEM_RULES:
            flat = pc.replace_substring_regex(flat, pat, repl)
    pn = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(arr)
    dl = np.bincount(pn, minlength=n).astype(np.int64)
    if pn.size == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64), dl)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(dl[:-1], out=starts[1:])
    pos = np.arange(pn.size, dtype=np.int64) - starts[pn]
    terms = flat.to_numpy(zero_copy_only=False)
    return pn, terms, pos, dl


def tokenize_expr(col, acfg: AnalyzerConfig = DEFAULT_ANALYZER):
    """Spark Column form of the same analyzer (for oracle-parallel SQL
    path). Hooks compose as array expressions: filter (stopwords) then
    transform (stem via sequential regexp_replace — Java regex rewrites
    use $1)."""
    from pyspark.sql import functions as F
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)
    if acfg.stopwords:
        sw = list(acfg.stopwords)
        toks = F.filter(toks, lambda t: ~t.isin(*sw))
    if acfg.stem == "s":
        def _stem_col(t):
            for pat, repl in _STEM_RULES:
                t = F.regexp_replace(t, pat, repl.replace("\\1", "$1"))
            return t
        toks = F.transform(toks, _stem_col)
    return toks


# DuckDB SQL fragment computing the identical token list for a column c:
DUCKDB_TOKENIZE = "regexp_extract_all(lower({c}), '[a-z0-9]+')"


def duckdb_tokenize(c: str, acfg: AnalyzerConfig = DEFAULT_ANALYZER) -> str:
    """DuckDB SQL fragment of the identical analyzer incl. config hooks
    (list_filter + sequential regexp_replace; RE2 rewrites use \\1)."""
    frag = DUCKDB_TOKENIZE.format(c=c)
    if acfg.stopwords:
        lst = ", ".join(f"'{w}'" for w in sorted(acfg.stopwords))
        frag = f"list_filter({frag}, x -> x NOT IN ({lst}))"
    if acfg.stem == "s":
        inner = "x"
        for pat, repl in _STEM_RULES:
            inner = f"regexp_replace({inner}, '{pat}', '{repl}')"
        frag = f"list_transform({frag}, x -> {inner})"
    return frag
