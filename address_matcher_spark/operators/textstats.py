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


def url_canonicalize(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """URL canonicalization + keeper election — step 1 of any web-corpus
    dedup (the input_hint table keys pages by url).  Lowercases scheme
    and host, strips a leading 'www.', drops the fragment and all
    utm_* tracking params, sorts the surviving query params, and
    normalises an empty path to '/'.  Keeper = min id per canonical URL
    (one window).  Ports/percent-encoding are left as-is (note in SURVEY).

    100 TB shape: a codegen'd projection plus ONE hash-partitioned
    window on canonical_url — the same shuffle a groupBy-dedup would
    pay, but keeps every row (keeper flag instead of a lossy distinct)."""
    from pyspark.sql import Window

    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
        r"^www\.", "")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    keep = F.array_sort(F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.startswith("utm_")))
    canonical = F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(F.size(keep) > 0,
               F.concat(F.lit("?"), F.concat_ws("&", keep))).otherwise(F.lit("")))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        canonical.alias("canonical_url"),
        host.alias("host"),
    )
    w = Window.partitionBy("canonical_url")
    return out.withColumn(
        "is_keeper", F.col("doc_id") == F.min("doc_id").over(w))


# PII patterns — dialect-neutral (no backrefs/lookaround) so the Java
# (Spark) and RE2 (DuckDB oracle) engines agree match-for-match; fixed
# widths where greedy leftmost-first vs leftmost-longest could differ
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """PII redaction for web corpora: count + redact emails, IPv4
    addresses, and phone-shaped numbers.  Counts are taken on the raw
    text; redaction is sequential (email → ip → phone) so a pattern
    never matches inside an earlier placeholder.  Native regexp
    expressions only — at 100 TB this is one codegen'd projection over
    the scan, no shuffle, no UDF."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>"),
        PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"),
        F.length(scrubbed).alias("n_scrubbed_chars"),
    )


def line_boilerplate_stats(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", split_re: str = r"\n",
                           min_docs: int = 2) -> DataFrame:
    """Line-level boilerplate detection (the CCNet/RefinedWeb trick):
    split each document into trimmed non-empty lines, count the DISTINCT
    documents each line occurs in, and report per document how many of
    its distinct lines are boilerplate (shared by >= min_docs docs).

    100 TB shape: explode → distinct (line, doc) pairs → line-frequency
    hash aggregation → equi-join back on the line — shuffle ∝ total
    lines, never all-pairs.  On a real corpus join on xxhash64(line)
    instead of the raw string to keep shuffle rows narrow."""
    lines = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), split_re)).alias("line"),
        )
        .select("doc_id", F.trim(F.col("line")).alias("line"))
        .filter(F.length("line") > 0)
        .distinct()
    )
    boiler = (
        lines.groupBy("line").agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line", F.lit(1).alias("is_boiler"))
    )
    return (
        lines.join(boiler, "line", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler_lines"),
        )
    )


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
