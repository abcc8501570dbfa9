"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting — all native
expressions (codegen'd, UDF-free, oracle-portable)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokeniser: letter runs | digit runs | single punctuation
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# word lists kept simple so the SQL oracle can mirror them verbatim
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
}


def _word_re(words: list[str]) -> str:
    return r"\b(?:" + "|".join(words) + r")\b"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), 0))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish sub-token count (letters/digits/punct split)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_word_re(STOPWORDS[lang])), 0)
    )


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def mean_word_len(text: Column) -> Column:
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), 0)
    total = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    )
    return F.round(total / F.greatest(F.size(words), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0,1]: penalise extreme length,
    high punctuation, missing stopwords, degenerate word lengths."""
    n_tok = token_count(text)
    sw_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(0.5)
    mwl = mean_word_len(text)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(0.5)
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(1.0)).otherwise(0.5)
    sw_ok = F.when(sw_ratio >= 0.05, F.lit(1.0)).otherwise(0.6)
    return F.round(0.4 * len_ok + 0.2 * mwl_ok + 0.2 * punct_ok + 0.2 * sw_ok, 6)


def lang_id(text: Column) -> Column:
    """n-gram/stopword-count heuristic language ID over {en, de, fr};
    'und' (undetermined) when no stopwords hit."""
    counts = {lang: stopword_count(text, lang) for lang in STOPWORDS}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # fixed priority order for ties: en > de > fr
    for lang in ["fr", "de", "en"]:
        out = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Normalised-content fingerprint: md5 of lowercase alnum-collapsed text."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    return F.md5(norm)


def rolling_min_fingerprint(text: Column, gram: int = 5) -> Column:
    """Winnowing-style sketch: minimum md5-derived hash over all character
    5-grams of the normalised text (rolling-hash fingerprint; robust to
    small edits)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (gram - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(norm, i, gram))
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
    )
    return F.array_min(hashes)


def document_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    # compute-heavy per row (one md5 per char 5-gram): round-robin the scan
    # when it has fewer splits than the cluster has slots, else the whole
    # projection runs on a single parquet split's task
    want = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < want:
        docs = docs.repartition(want)
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_len(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
        rolling_min_fingerprint(t).alias("min_gram_hash"),
    )


# Gopher-style quality-filter thresholds (Rae et al. 2021, §A1.1 — scaled
# word-count floor for the short synthetic docs; the published floor is 50)
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_filter(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Gopher-rule document filter: keep/drop + first failing rule.

    All ratios are exact-integer divisions compared raw (no rounding), so
    the SQL oracle reproduces every boundary decision bit-for-bit.  Native
    expressions only — at 100 TB this is one codegen'd projection over the
    scan, no shuffle."""
    t = F.col(text_col)
    words = F.regexp_extract_all(F.lower(t), F.lit(r"\S+"), 0)
    n_words = F.size(words)
    letters = F.regexp_extract_all(F.lower(t), F.lit(r"[a-z]+"), 0)
    letter_chars = F.aggregate(
        F.transform(letters, F.length), F.lit(0), lambda a, x: a + x
    )
    mwl = letter_chars / F.greatest(F.size(letters), F.lit(1))
    n_hash = F.length(F.regexp_replace(t, r"[^#]", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
    symbol_ratio = (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_ratio = alpha_words / F.greatest(n_words, F.lit(1))
    n_stop = stopword_count(t)

    reason = (
        F.when(n_words < F.lit(GOPHER_MIN_WORDS), F.lit("too_few_words"))
        .when(n_words > F.lit(GOPHER_MAX_WORDS), F.lit("too_many_words"))
        .when(mwl < F.lit(GOPHER_MIN_MEAN_WORD_LEN), F.lit("mean_word_len_low"))
        .when(mwl > F.lit(GOPHER_MAX_MEAN_WORD_LEN), F.lit("mean_word_len_high"))
        .when(symbol_ratio > F.lit(GOPHER_MAX_SYMBOL_RATIO),
              F.lit("symbol_ratio_high"))
        .when(alpha_ratio < F.lit(GOPHER_MIN_ALPHA_WORD_RATIO),
              F.lit("alpha_word_ratio_low"))
        .when(n_stop < F.lit(GOPHER_MIN_STOPWORDS), F.lit("too_few_stopwords"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )
