"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure
column expressions (whole-stage codegen) except noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that",
                "for", "was", "on", "with", "as", "at", "by", "be", "this"]
# BPE-ish token split: words, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count (whitespace), bpe_token_count (regex pieces),
    char_count."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (df
            .withColumn("char_count", F.length(text_col))
            .withColumn("token_count",
                        F.when(F.trim(F.col(text_col)) == "", 0).otherwise(ws))
            .withColumn("bpe_token_count",
                        F.size(F.regexp_extract_all(
                            F.col(text_col), F.lit(TOKEN_RE), 0))))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score in [0,1]:
    alpha_ratio, punct_ratio, stopword_ratio, mean_token_len.
    score = clamp(0.4*alpha + 0.3*(1-punct) + 0.3*min(stopword*5, 1))."""
    s = F.col(text_col)
    n = F.greatest(F.length(s), F.lit(1))
    alpha = F.length(F.regexp_replace(s, r"[^A-Za-z]", "")) / n
    punct = F.length(F.regexp_replace(s, r"[A-Za-z0-9\s]", "")) / n
    toks = F.split(F.lower(F.trim(s)), r"\s+")
    ntok = F.greatest(F.size(toks), F.lit(1))
    stop = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS))) / ntok
    mean_tok = n / ntok
    score = (F.lit(0.4) * alpha + F.lit(0.3) * (F.lit(1.0) - punct)
             + F.lit(0.3) * F.least(stop * 5, F.lit(1.0)))
    return (df
            .withColumn("alpha_ratio", alpha)
            .withColumn("punct_ratio", punct)
            .withColumn("stopword_ratio", stop)
            .withColumn("mean_token_len", mean_tok)
            .withColumn("quality_score",
                        F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))))


def with_lang_id(df: DataFrame, text_col: str = "text",
                 en_threshold: float = 0.08) -> DataFrame:
    """Heuristic language ID: English iff stopword share of tokens >=
    threshold AND text is mostly ASCII letters. Emits lang_pred
    ('en'/'other'). n-gram-free but deterministic and cheap; a real
    deployment swaps in a fastText-style model via mapInPandas."""
    s = F.col(text_col)
    toks = F.split(F.lower(F.trim(s)), r"\s+")
    ntok = F.greatest(F.size(toks), F.lit(1))
    stop = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS))) / ntok
    ascii_ratio = (F.length(F.regexp_replace(s, r"[^\x00-\x7F]", "")) /
                   F.greatest(F.length(s), F.lit(1)))
    return df.withColumn(
        "lang_pred",
        F.when((stop >= en_threshold) & (ascii_ratio >= 0.9), "en")
         .otherwise("other"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: 64-bit hash of the
    whitespace-normalized, lowercased text (content identity for exact
    dedup joins), plus a locality-sensitive prefix fingerprint (hash of
    the first 8 normalized tokens) for clustered storage."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    first8 = F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8))
    return (df
            .withColumn("fingerprint", F.xxhash64(norm))
            .withColumn("prefix_fingerprint", F.xxhash64(first8)))
