"""Text-analysis column functions for training-data pipelines.

All JVM-side builtins (split/regexp/md5/array ops) — no Python UDFs, so
they stay inside whole-stage codegen and scale linearly with the scan.
Each has an ANSI-SQL equivalent used by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: language ID at 100 TB must be a broadcastable
# constant, not a model lookup.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "is", "of", "to"],
    "es": ["el", "la", "de", "que", "un"],
    "fr": ["le", "les", "des", "une", "est"],
}
STOPWORDS = ["the", "a", "is", "of", "to", "and", "in"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: alpha runs count 1, digits count
    singly, punctuation singly — a cheap, deterministic proxy for tokenizer
    budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]|[^a-z0-9 ]"), 0)).cast("bigint")


def distinct_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def mean_token_len(text: Column) -> Column:
    """(chars − separators) / tokens; identical arithmetic to the SQL
    oracle so doubles match bit-for-bit."""
    t = tokens(text)
    return (F.length(text) - (F.size(t) - 1)) * F.lit(1.0) / F.size(t)


def fingerprint(text: Column) -> Column:
    """Key-collision fingerprint (OpenRefine style): md5 of the sorted
    distinct token set — whitespace/order/duplication-insensitive document
    identity for exact-ish dedup."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def lang_scores(text: Column) -> dict[str, Column]:
    """Occurrence count of per-language marker words."""
    t = tokens(text)
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(*words))).cast("bigint")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break."""
    scores = lang_scores(text)
    langs = sorted(scores)  # alphabetical order ⇒ first max wins ties
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length, lexical diversity,
    word-length sanity, stopword presence — the standard cheap pre-filter
    before expensive model scoring."""
    t = tokens(text)
    n = F.size(t)
    length_part = F.least(F.lit(1.0), n / F.lit(100.0))
    diversity = F.size(F.array_distinct(t)) / n
    wordlen_part = F.least(F.lit(1.0), mean_token_len(text) / F.lit(8.0))
    stop_part = F.least(
        F.lit(1.0),
        F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / F.lit(5.0),
    )
    return (
        length_part * F.lit(0.4)
        + diversity * F.lit(0.3)
        + wordlen_part * F.lit(0.2)
        + stop_part * F.lit(0.1)
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (1-based slice; empty if fewer than n
    tokens — guards Spark's descending-sequence pitfall)."""
    t = tokens(text)
    starts = F.sequence(F.lit(1), F.size(t) - (n - 1))
    sh = F.array_distinct(F.transform(starts, lambda i: F.array_join(F.slice(t, i, n), " ")))
    return F.when(F.size(t) >= n, sh).otherwise(F.array().cast("array<string>"))


# --- PII scrubbing (training-data hygiene) ---------------------------------
# Patterns kept in the portable subset shared by Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"


def mask_emails(c: Column, token: str = "<EMAIL>") -> Column:
    return F.regexp_replace(c, EMAIL_RE, token)


def mask_urls(c: Column, token: str = "<URL>") -> Column:
    return F.regexp_replace(c, URL_RE, token)


def mask_phones(c: Column, token: str = "<PHONE>") -> Column:
    return F.regexp_replace(c, PHONE_RE, token)


def scrub_pii(c: Column) -> Column:
    """Mask URLs, then emails, then phone numbers (order matters: URLs can
    contain @ and digits)."""
    return mask_phones(mask_emails(mask_urls(c)))


def pii_counts(c: Column) -> dict[str, Column]:
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("bigint"),
        "n_urls": F.regexp_count(c, F.lit(URL_RE)).cast("bigint"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("bigint"),
    }


def token_chunks(text: Column, size: int = 20) -> Column:
    """Consecutive non-overlapping ``size``-token chunks, each re-joined
    with single spaces — the unit of paragraph/chunk-level dedup (d22).
    The last chunk may be short (slice clamps at the end); duplicates
    within a document are KEPT (each instance counts toward the doc's
    copied fraction)."""
    t = tokens(text)
    n_chunks = F.ceil(F.size(t) / size).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        starts, lambda i: F.array_join(F.slice(t, i * size + 1, size), " ")
    )
