"""Text-analysis operators for a training-data pipeline over ``documents``.

All hot-path logic is built-in column expressions (JVM, whole-stage codegen)
— no Python UDFs. Capability graft of the reference's analyzer pipeline
(lowercase+asciifolding/ngram/synonym ES analyzers,
/root/reference/config/addr_settings.json:6-68, SURVEY.md §2.8 T10-T15),
re-expressed as deterministic Spark expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]
# per-language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def tokens(col) -> Column:
    """Whitespace tokenization of trimmed, lowercased text; empty text → []."""
    c = F.lower(F.trim(col))
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: split on whitespace AND punctuation AND
    letter/digit boundaries (a cheap BPE proxy for budget estimation)."""
    pre = F.regexp_replace(col, r"([0-9]+|[^\sA-Za-z0-9])", r" $1 ")
    return token_count(pre)


def stopword_ratio(col) -> Column:
    toks = tokens(col)
    return (
        F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
        / F.greatest(F.size(toks), F.lit(1))
    ).cast("double")


def punct_ratio(col) -> Column:
    """Share of .,!?;: characters (explicit set — identical across engines)."""
    total = F.length(col)
    no_punct = F.length(F.regexp_replace(col, r"[.,!?;:]", ""))
    return ((total - no_punct) / F.greatest(total, F.lit(1))).cast("double")


def quality_score(col) -> Column:
    """Deterministic [0,1] quality score: length factor × (1 − punct ratio)
    × (1 − capped stopword deficit). All per-row float math (no accumulation),
    so cross-engine exact under IEEE."""
    length_factor = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_factor = F.lit(1.0) - F.least(
        F.abs(sw - F.lit(0.3)) / F.lit(0.3), F.lit(1.0)
    ) * F.lit(0.5)
    return (length_factor * (F.lit(1.0) - punct_ratio(col)) * sw_factor).cast("double")


def lang_id(col) -> Column:
    """Marker-word language ID: the language with the most marker hits wins;
    ties and zero hits → 'unknown'. Deterministic order of comparison."""
    toks = tokens(col)

    def marker_hits(markers):
        # NB: single-arg lambda only — PySpark passes the array index to a
        # second lambda parameter, so default-arg capture breaks semantics.
        return F.size(F.filter(toks, lambda x: x.isin(markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    # reversed so that earlier languages win ties via later when() precedence
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col) -> Column:
    """128-bit content fingerprint (md5 hex — identical in Spark and DuckDB;
    reference analog: deterministic doc ids, objects.rs:979-988)."""
    return F.md5(col)


def rolling_fingerprints(text_col: str, window: int = 16) -> Column:
    """Array of rolling window fingerprints (document-fragment identity):
    md5 of each ``window``-char window, stride = window/2. Built-ins only:
    sequence → transform → substring."""
    stride = window // 2
    return F.expr(
        f"transform(sequence(0, greatest(cast((length({text_col}) - {window}) / {stride} as int), 0)),"
        f" i -> md5(substring({text_col}, i * {stride} + 1, {window})))"
    )


def analyze(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    c = F.col(text_col)
    return documents.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
