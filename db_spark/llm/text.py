"""Text analysis operators over document tables.

All operators are pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs — so they run at full scan throughput on any
cluster size. Deterministic by construction: md5-based fingerprints,
integer-arithmetic ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + ASCII so the same heuristic is
# expressible in any SQL dialect for oracle checks.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit", "den", "von"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "un", "una", "es", "en", "por"],
}

_WORD_RE = r"[a-zA-Z']+"
# BPE-ish token regex: word pieces, numbers, or single non-space symbols
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace-free word extraction (robust to repeated separators)."""
    return F.regexp_extract_all(text, F.lit(_WORD_RE), 0)


def token_count(text: Column) -> Column:
    """Whitespace word count."""
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: words + numbers + individual symbols — a
    cheap, deterministic proxy for subword token counts."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), 0)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return (punct.cast("double") / F.length(text).cast("double"))


def stopword_count(text: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    sw = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(sw))).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text, lang).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def avg_word_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence
    and typical word lengths, penalizes punctuation density and extreme
    shortness. Deterministic rational arithmetic."""
    n = token_count(text)
    len_score = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    p = punct_ratio(text)
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - p * 4.0)
    return (len_score * 0.4 + sw_score * 0.3 + punct_penalty * 0.3)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling-hash variant is shingle_hashes in dedup.py.)"""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def language_id(text: Column) -> Column:
    """Stopword-vote language ID over STOPWORDS; ties break by language
    code order; no votes -> 'und' (undetermined)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(sw)))
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # iterate in reverse code order so earlier codes win ties
    for lang in sorted(scores, reverse=True):
        result = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(result)
    return result


def chunk_documents(
    df: DataFrame, chunk_tokens: int = 64, overlap: int = 16,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the unit a
    training pipeline feeds to a tokenizer/packer. Returns one row per
    chunk: (id, chunk_id, n_tokens, chunk_text).

    Chunk k covers tokens [k*stride, k*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the trailing partial chunk is kept.
    Pure Column expressions (tokenize -> sequence -> slice -> explode):
    narrow transforms only, no shuffle, no Python — chunking 100 TB is a
    map-only job. Empty documents produce no chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk ids 0..floor((n-1)/stride); empty arrays for empty docs
    ids = F.when(n > 0, F.sequence(
        F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), toks.alias("_toks"),
        F.explode(ids).alias("chunk_id"))
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document statistics table."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio_en"),
        avg_word_len(t).alias("avg_word_len"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
        language_id(t).alias("lang_pred"),
    )
