"""Analyzer golden cases + vectorized/pure-Python parity (SURVEY.md §5.2)."""
import numpy as np
import pandas as pd

from engine.analyzer import doc_term_freqs, tokenize_py, tokenize_series


GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("MiXeD-Case7!", ["mixed", "case7"]),
    ("", []),
    ("!!! ... ---", []),
    ("a  b\tc\nd", ["a", "b", "c", "d"]),
    ("über café 東京", ["ber", "caf"]),  # non-ascii split (frozen [a-z0-9]+)
    ("x1y2z3", ["x1y2z3"]),
    ("hot0 hot0 hot0", ["hot0", "hot0", "hot0"]),
]


def test_tokenize_py_golden():
    for text, want in GOLDEN:
        assert tokenize_py(text) == want, text


def test_series_matches_py():
    texts = pd.Series([t for t, _ in GOLDEN] + [None])
    got = tokenize_series(texts)
    for i, (_, want) in enumerate(GOLDEN):
        assert list(got.iloc[i]) == want
    assert list(got.iloc[-1]) == []  # null text -> no tokens


def test_doc_term_freqs():
    texts = pd.Series(["a b a c a", "", "b B b", None])
    rows, terms, tfs, dl = doc_term_freqs(texts)
    np.testing.assert_array_equal(dl, [5, 0, 3, 0])
    got = {(int(r), t): int(f) for r, t, f in zip(rows, terms, tfs)}
    assert got == {(0, "a"): 3, (0, "b"): 1, (0, "c"): 1, (2, "b"): 3}


def test_doc_term_freqs_empty_batch():
    rows, terms, tfs, dl = doc_term_freqs(pd.Series([], dtype=object))
    assert len(rows) == 0 and len(dl) == 0


def test_doc_term_freqs_arrow_equivalence():
    """Arrow fast path == frozen pandas path, incl. the non-ASCII fallback
    (utf8_lower vs str.lower divergence, e.g. U+0130) and null/empty rows."""
    import numpy as np
    import pyarrow as pa
    from engine.analyzer import doc_term_freqs_arrow
    from engine.fixtures import make_transcripts

    def canon(r):
        rows, terms, tfs, dl = r
        o = np.lexsort((np.asarray(terms, dtype="U"), np.asarray(rows)))
        return (np.asarray(rows)[o].tolist(),
                [str(t) for t in np.asarray(terms, object)[o]],
                np.asarray(tfs)[o].tolist(), np.asarray(dl).tolist())

    fixture_texts = make_transcripts(n_convs=50)["text"].reset_index(drop=True)
    weird = pd.Series(["Größe K 42", "İstanbul ŞEY", "ẞharp", None, "",
                       "a b  c", "..!!", "MiXeD 007 Case"])
    for texts in (fixture_texts, weird):
        got = canon(doc_term_freqs_arrow(pa.array(texts, pa.string())))
        want = canon(doc_term_freqs(texts))
        assert got == want


def test_spark_xxhash64_property(spark):
    """The claimed JVM-equivalence property test (engine/xxh.py docstring):
    the driver-side XXH64 twin must match F.xxhash64 byte-for-byte over
    random + unicode strings spanning every tail-length code path
    (0, 1-3, 4-7, 8-31, 32+ UTF-8 bytes). A silent divergence would prune
    the WRONG bucket and drop postings with no error."""
    import random

    from pyspark.sql import functions as F

    from engine.xxh import spark_xxhash64, term_bucket

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    uni = "éüßñİıΔЖ中文🙂İß"
    cases = ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh",
             "x" * 31, "x" * 32, "x" * 33, "x" * 100,
             "İstanbul", "中文字符串测试三十二字节以上路径", "🙂" * 10]
    for n in (1, 2, 3, 5, 7, 8, 15, 16, 31, 32, 33, 64, 200):
        cases.append("".join(rng.choice(alpha) for _ in range(n)))
        cases.append("".join(rng.choice(alpha + uni) for _ in range(n)))
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in cases:
        assert spark_xxhash64(s) == got[s], repr(s)
        assert term_bucket(s, 16) == got[s] % 16, repr(s)


def test_analyzer_hooks_four_forms_agree(spark):
    """C3 config hooks (stopwords + light plural stemmer) produce the
    IDENTICAL token stream across all synchronized forms: pure-Python,
    pandas, Arrow fast path, Spark expression, and the DuckDB SQL twin."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from engine.analyzer import (doc_term_freqs, doc_term_freqs_arrow,
                                 duckdb_tokenize, tokenize_expr, tokenize_py)
    from engine.config import AnalyzerConfig

    acfg = AnalyzerConfig(stopwords=("the", "a", "of"), stem="s")
    texts = ["The queries of the parsers pass GAS tests",
             "days this does buses 42s ss is a energies",
             "", "THE THE THE", "pass passes passed class classes",
             "Größe Ties dies İstanbul days"]  # non-ASCII -> pandas fallback

    # frozen expectations for the stemmer itself
    assert tokenize_py("queries days this does gas ss class", acfg) == \
        ["query", "day", "this", "does", "gas", "ss", "class"]

    want = [tokenize_py(t, acfg) for t in texts]

    # pandas + arrow paths, via the tf tuples (canonical multiset form)
    def canon(r):
        rows, terms, tfs, _ = r
        return sorted(zip(np.asarray(rows).tolist(),
                          [str(t) for t in terms],
                          np.asarray(tfs).tolist()))
    from collections import Counter
    want_tf = sorted((i, t, c) for i, toks in enumerate(want)
                     for t, c in Counter(toks).items())
    assert canon(doc_term_freqs(pd.Series(texts), acfg)) == want_tf
    assert canon(doc_term_freqs_arrow(pa.array(texts, pa.string()), acfg)) == want_tf
    # dl counts post-filter tokens
    _, _, _, dl = doc_term_freqs(pd.Series(texts), acfg)
    assert dl.tolist() == [len(w) for w in want]

    # Spark expression form
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got_expr = {r["i"]: r["toks"] for r in df.select(
        "i", tokenize_expr(F.col("text"), acfg).alias("toks")).collect()}
    assert [got_expr[i] for i in range(len(texts))] == want

    # DuckDB twin — ASCII rows only: DuckDB's lower() maps U+0130 'İ'
    # -> 'i' (simple case folding) where Python/Java produce 'i' + a
    # combining dot, a pre-existing documented divergence of the SQL
    # twin on non-ASCII (the frozen analyzer semantics are the Python
    # ones; the driver tables are ASCII)
    ascii_rows = [i for i, t in enumerate(texts) if t.isascii()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{texts[i]}')" for i in ascii_rows)
                + ") v(i, text)")
    rows = con.execute(
        f"SELECT i, {duckdb_tokenize('text', acfg)} AS toks FROM t ORDER BY i"
    ).fetchall()
    assert [r[1] for r in rows] == [want[i] for i in ascii_rows]
