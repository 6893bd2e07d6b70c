"""Text-analysis Column expressions: tokens, quality, lang-id, fingerprints.

Training-data-pipeline operators over ``documents``/``pages`` tables (task
brief). All JVM-side built-ins — regexp/length/md5 — so they stay in
whole-stage codegen and are DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Chosen to be unambiguous across the five fixture languages.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "that"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "los", "que", "para", "es"],
    "pt": ["o", "os", "que", "para", "um"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Java's \s includes vertical tab \x0B; RE2's (DuckDB's) does not — a
# document containing a VT would tokenize differently across engines and
# flip every token-derived gate (r5 ADVICE). Every whitespace split /
# collapse uses this explicit class so the split set is
# dialect-independent; oracle SQL twins embed the same class literally.
WS_CLASS = r"[ \t\n\r\f\x0B]"
WS_RUN = WS_CLASS + "+"


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: words + punctuation runs are a
    separate count, see ``subword_count``)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", 0).otherwise(F.size(F.split(trimmed, WS_RUN))).cast("long")


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs and
    single punctuation marks (regexp token classes)."""
    return (
        F.size(F.regexp_extract_all(
            text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]"), F.lit(0)
        ))
    ).cast("long")


def word_occurrences(text: Column, word: str) -> Column:
    """Count of whole-word occurrences (case-insensitive)."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"\b" + word + r"\b"), F.lit(0))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = token_count(text)
    stops = sum((word_occurrences(text, w) for w in STOPWORDS_EN), F.lit(0).cast("long"))
    return F.when(toks > 0, stops.cast("double") / toks.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    """Mean whitespace-token length (Gopher rule: corpora with mean word
    length outside ~[3, 10] are mostly boilerplate/garbage). Computed as
    non-whitespace chars / token count — identical to summing token
    lengths for a whitespace split, without a higher-order pass."""
    n = token_count(text)
    chars = F.length(F.regexp_replace(text, WS_CLASS, ""))
    return F.when(n > 0, chars.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    """Fraction of characters that are digits (tables/serials score high)."""
    n = F.length(text)
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column) -> Column:
    """(# + ellipsis) symbols per word (Gopher: > 0.1 flags spam/truncated
    scrapes). Ellipses counted as non-overlapping '...' runs."""
    hashes = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    ell = (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / F.lit(3)
    return (hashes + ell).cast("double") / F.greatest(token_count(text), F.lit(1)).cast(
        "double"
    )


def bullet_line_ratio(text: Column) -> Column:
    """Fraction of lines starting with a bullet (-, *, •) — Gopher flags
    > 90% bullet lines as list-boilerplate."""
    lines = F.split(text, "\n")
    bullets = F.size(F.filter(lines, lambda l: l.rlike("^" + WS_CLASS + "*[-*•]")))
    return bullets.cast("double") / F.greatest(F.size(lines), F.lit(1)).cast("double")


def ellipsis_line_ratio(text: Column) -> Column:
    """Fraction of lines ending with an ellipsis ('...' or U+2026) —
    Gopher flags > 30% as truncated-preview boilerplate."""
    lines = F.split(text, "\n")
    ell = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)" + WS_CLASS + "*$")))
    return ell.cast("double") / F.greatest(F.size(lines), F.lit(1)).cast("double")


def _nonblank(parts: Column) -> Column:
    """Trim each part, drop blanks (shared by the duplicate-fraction rules).

    The lambda MUST be single-arg: ``F.transform(parts, F.trim)`` would call
    the two-parameter trim(col, trimstr) with the ELEMENT INDEX as the trim
    string — silently trimming '0'/'1'/... characters per position."""
    return F.filter(F.transform(parts, lambda p: F.trim(p)), lambda p: p != "")


def dup_line_frac(text: Column) -> Column:
    """Gopher repetition rule: fraction of non-blank lines that are exact
    duplicates of an earlier line (1 - distinct/total). Pure per-row array
    expressions — no shuffle, whole-stage codegen."""
    lines = _nonblank(F.split(text, "\n"))
    n = F.size(lines)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_para_frac(text: Column) -> Column:
    """Gopher repetition rule: duplicate-paragraph fraction. Paragraphs are
    blank-line-separated blocks (split on 2+ newlines)."""
    paras = _nonblank(F.split(text, r"\n{2,}"))
    n = F.size(paras)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(paras)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]: length band + alpha ratio
    + moderate punctuation + stopword presence (heuristic quality scoring
    for training-data filtering)."""
    n = F.length(text).cast("double")
    length_term = F.least(n / F.lit(1000.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    return F.round(
        (length_term + alpha_ratio(text) + punct_term + F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0)))
        / F.lit(4.0),
        6,
    )


def lang_score(text: Column, lang: str) -> Column:
    """Marker-word hit count for one language."""
    return sum(
        (word_occurrences(text, w) for w in LANG_MARKERS[lang]), F.lit(0).cast("long")
    )


def lang_id(text: Column) -> Column:
    """argmax over language marker scores; 'und' when all zero.

    Deterministic tie-break: language order en>de>fr>es>pt (strictly
    greater-than comparison keeps the earlier language on ties)."""
    langs = list(LANG_MARKERS)
    scores = {lg: lang_score(text, lg) for lg in langs}
    best = F.greatest(*scores.values())
    pick = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):
        pick = F.when(scores[lg] == best, F.lit(lg)).otherwise(pick)
    return F.when(best > 0, pick).otherwise(F.lit("und"))


def content_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit content fingerprint: first 16 hex chars of
    md5, reinterpreted as a signed long. md5 is bit-identical in DuckDB, so
    this is oracle-checkable (exact-dedup key)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")


# PII patterns kept to RE2-compatible constructs (char classes + \b) so the
# SAME pattern strings run in Spark (Java regex) and DuckDB (RE2) with
# identical match sets — no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_email_count(text: Column) -> Column:
    """Email-address occurrences (the most common PII class a web-corpus
    pipeline must count/scrub before release)."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long")


def pii_ipv4_count(text: Column) -> Column:
    """IPv4-literal occurrences (server logs / dumps leaking into text)."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), F.lit(0))).cast("long")


def redact_pii(text: Column) -> Column:
    """Scrubbed text: emails -> <EMAIL>, IPv4 literals -> <IP>. Pure
    vectorized regexp_replace — the release-time redaction pass."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def extract_text_from_html(html: Column) -> Column:
    """Deterministic text extraction from the html payload (G27 / the
    input_hint per-row invariant: byte-identical extracted text per url).
    The synthetic html is ``<html><body>{text}</body></html>`` (UTF-8);
    extraction = decode + strip the fixed wrapper tags — pure JVM, no
    Python, so the invariant holds on any partitioning/cluster size."""
    s = F.decode(html, "UTF-8")
    return F.regexp_replace(s, r"^<html><body>|</body></html>$", "")


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), WS_RUN, " "))
