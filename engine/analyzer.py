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

from .config import TOKEN_PATTERN

_RX = re.compile(TOKEN_PATTERN)


def tokenize_py(text: str) -> list[str]:
    return _RX.findall(text.lower()) if text else []


def tokenize_series(texts: pd.Series) -> pd.Series:
    """text -> list[str] per row, vectorized (pandas C string kernels)."""
    return texts.fillna("").str.lower().str.findall(_RX)


def doc_term_freqs(texts: pd.Series):
    """Vectorized per-document term frequencies for one Arrow batch.

    Returns ``(row_idx:int64[], term:object[], tf:int64[], dl:int64[nrows])``
    where ``row_idx`` indexes into the input batch. No per-row Python loop:
    token lists are exploded with ``np.repeat`` + ``np.concatenate`` and
    counted with a single pandas groupby (C hash aggregation).
    """
    toks = tokenize_series(texts)
    toks.index = pd.RangeIndex(len(toks))
    dl = toks.str.len().to_numpy(dtype=np.int64)
    n = len(texts)
    if n == 0 or dl.sum() == 0:
        return (np.empty(0, np.int64), np.empty(0, object), np.empty(0, np.int64), dl)
    flat = toks.explode().dropna()  # index = source row, values = tokens
    g = pd.DataFrame({"r": flat.index.to_numpy(np.int64),
                      "t": flat.to_numpy(object)}).groupby(
        ["r", "t"], sort=False, observed=True).size()
    idx = g.index
    return (idx.get_level_values(0).to_numpy(np.int64),
            idx.get_level_values(1).to_numpy(object),
            g.to_numpy(np.int64), dl)


def doc_term_freqs_arrow(arr):
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
        return doc_term_freqs(arr.to_pandas())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), "[^a-z0-9]+")
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    mask = pc.not_equal(flat, "")
    flat, parents = flat.filter(mask), parents.filter(mask)
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


def tokenize_expr(col):
    """Spark Column form of the same analyzer (for oracle-parallel SQL path)."""
    from pyspark.sql import functions as F
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


# DuckDB SQL fragment computing the identical token list for a column c:
DUCKDB_TOKENIZE = "regexp_extract_all(lower({c}), '[a-z0-9]+')"
