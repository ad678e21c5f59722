"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting (analyzer +
BPE-ish regex), document fingerprinting.

All hot paths are Catalyst expressions (JVM codegen) — no Python in the
row path; each op has a DuckDB-SQL twin in __spark_entry__ for the
driver's correctness gate. The md5-based fingerprints are deliberately
engine-portable (same bytes in Spark and DuckDB) so oracles compare
exactly; the rolling-hash fingerprint is engine-native (numpy) and is
property-tested in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analyzer import tokenize_expr

# BPE-ish pre-tokenizer: letter runs, digit runs, or single
# non-alphanumeric glyphs (GPT-2-style pre-split, simplified & frozen).
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
DUCKDB_BPE = "regexp_extract_all(lower({c}), '[a-z]+|[0-9]+|[^a-z0-9\\s]')"

# tiny frozen stopword lists per language (heuristic language-ID)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "de": ["der", "die", "das", "und", "zu", "ist"],
    "fr": ["le", "la", "de", "et", "les", "est"],
}


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token counts under BOTH tokenizers (analyzer + BPE-ish)."""
    toks = tokenize_expr(F.col(text_col))
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0)
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score: length, stopword ratio, punct
    ratio, mean token length. Frozen formula (documented, arbitrary):
    quality = 0.4*min(n_tokens/100, 1) + 0.3*(1 - stop_ratio)
              + 0.3*(1 - punct_ratio)."""
    toks = tokenize_expr(F.col(text_col))
    n_tok = F.size(toks)
    safe_n = F.greatest(n_tok, F.lit(1))
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    alnum_sp = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                         "[^a-z0-9 ]", ""))
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    punct_ratio = (F.length(F.col(text_col)) - alnum_sp).cast("double") / n_chars
    stop_ratio = stop.cast("double") / safe_n
    mean_tok_len = (F.aggregate(toks, F.lit(0).cast("long"),
                                lambda acc, t: acc + F.length(t))
                    .cast("double") / safe_n)
    quality = (F.lit(0.4) * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
               + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
               + F.lit(0.3) * (F.lit(1.0) - punct_ratio))
    return df.select(
        "doc_id", n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(quality, 6).alias("quality"))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: per language, fraction of tokens in that
    language's frozen stopword list; argmax wins, 'und' (undetermined)
    if the best ratio is < 0.02. Ties broken by language code ascending."""
    toks = tokenize_expr(F.col(text_col))
    safe_n = F.greatest(F.size(toks), F.lit(1))

    def _in(sw):  # single-arg lambda: F.filter treats 2-arg as (elem, idx)
        return lambda t: t.isin(*sw)

    scored = df.select("doc_id", *[
        (F.size(F.filter(toks, _in(sw))).cast("double")
         / safe_n).alias(f"r_{lang}")
        for lang, sw in sorted(STOPWORDS.items())])
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"r_{la}") for la in langs])
    pred = F.when(best < 0.02, F.lit("und"))
    for la in langs:  # first match in ascending order == tie-break
        pred = pred.when(F.col(f"r_{la}") == best, F.lit(la))
    return scored.select("doc_id", F.round(best, 6).alias("best_ratio"),
                         pred.alias("lang_pred"))


def fingerprint_md5(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-token-stream md5 (engine-portable exact fingerprint)."""
    return df.select("doc_id", F.md5(
        F.array_join(tokenize_expr(F.col(text_col)), " ")).alias("fp"))


def fingerprint_rolling(df: DataFrame, text_col: str = "text",
                        base: int = 1000003, mod: int = (1 << 31) - 1) -> DataFrame:
    """Polynomial rolling hash over the normalized token stream —
    fp = Σ h(tok_i)·base^(n-1-i) mod (2^31-1), h = xxhash64(token).
    (Mersenne-31 keeps every intermediate < 2^51 — no int64 overflow in
    the fold.)

    Engine-native (not DuckDB-portable: xxhash64 differs) — verified in
    pytest against a pure-Python reimplementation. Expressed with
    aggregate() so it stays JVM-side."""
    toks = tokenize_expr(F.col(text_col))
    h = lambda t: F.pmod(F.xxhash64(t), F.lit(mod))  # noqa: E731
    rolled = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + h(t), F.lit(mod)))
    return df.select("doc_id", rolled.alias("fp64"))


def fingerprint_rolling_md5(df: DataFrame, text_col: str = "text",
                            base: int = 1000003,
                            mod: int = (1 << 31) - 1) -> DataFrame:
    """Engine-PORTABLE variant of the polynomial rolling fingerprint:
    token hash = first 15 md5 nibbles as int64, mod Mersenne-31 (md5 is
    bit-identical across engines), same fold as fingerprint_rolling.
    Gives the rolling-hash family a DuckDB oracle twin
    (list_transform + list_reduce) for the driver's hard gate; the
    xxhash64 variant stays the engine-internal fast path."""
    toks = tokenize_expr(F.col(text_col))

    def h(t):
        return F.pmod(F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                      .cast("long"), F.lit(mod))

    rolled = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base) + h(t), F.lit(mod)))
    return df.select("doc_id", rolled.alias("fp64"))
