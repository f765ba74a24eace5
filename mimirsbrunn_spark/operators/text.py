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
    ties resolve to the EARLIEST language in LANG_MARKERS order (en before
    de before fr — deterministic, and what the DuckDB gate twin mirrors);
    zero hits → 'unknown'."""
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


# ---------------------------------------------------------------------------
# boilerplate removal: per-host frequent segments
# ---------------------------------------------------------------------------
# Web pages of one host repeat navigation/footer/legal segments across most
# documents; training pipelines strip segments whose within-host document
# frequency exceeds a threshold (the CCNet/RefinedWeb-style dedup-by-
# frequency pass). Segments are pinned as '. '-separated spans (literal
# separator — identical split semantics in Spark regex-escaped and DuckDB
# literal string_split), compared after lower+trim normalization.


def _segments(text_col):
    from pyspark.sql import functions as F

    return F.split(text_col, r"\. ")


def boilerplate_segments(
    docs,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.5,
    min_host_docs: int = 2,
):
    """(host, seg_norm, n_docs, host_docs, ratio) for segments appearing in
    >= min_ratio of a host's documents (hosts with < min_host_docs docs are
    exempt — a 1-doc host would mark everything boilerplate)."""
    from pyspark.sql import functions as F

    host_docs = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(id_col).alias("host_docs")
    )
    seg = (
        docs.select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("id"),
            F.explode(_segments(F.col(text_col))).alias("seg"),
        )
        .select("host", "id", F.trim(F.lower("seg")).alias("seg_norm"))
        .filter(F.col("seg_norm") != "")
        .distinct()
    )
    freq = seg.groupBy("host", "seg_norm").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        freq.join(host_docs, "host")
        .withColumn("ratio", F.col("n_docs") / F.col("host_docs"))
        .filter((F.col("host_docs") >= min_host_docs) & (F.col("ratio") >= min_ratio))
    )


def strip_boilerplate(
    docs,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.5,
    min_host_docs: int = 2,
):
    """Documents with boilerplate segments removed: segments re-joined with
    '. ' in original order (posexplode keeps positions). Returns
    (id, host, clean_text, n_removed).

    PINNED semantics: a document whose segments are ALL boilerplate is
    KEPT, with clean_text = '' and n_removed = its segment count — the
    curation funnel decides whether to drop empties (an explicit,
    observable step), the strip operator never disappears a document.
    One groupBy over the marked segments (kept text and removed count are
    aggregated together — no second shuffle/join)."""
    from pyspark.sql import functions as F

    boiler = boilerplate_segments(
        docs, host_col, id_col, text_col, min_ratio, min_host_docs
    ).select("host", "seg_norm", F.lit(True).alias("_is_boiler"))
    seg = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        # NULL text → NULL split → posexplode emits NO rows, silently
        # disappearing the document; coalesce to '' so NULL-text docs keep
        # the pinned contract (kept, clean_text='')
        F.posexplode(
            _segments(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "seg"),
    ).withColumn("seg_norm", F.trim(F.lower("seg")))
    marked = seg.join(boiler, ["host", "seg_norm"], "left")
    return (
        marked.groupBy("id", "host")
        .agg(
            # when() without otherwise yields NULL for boilerplate rows and
            # collect_list skips NULLs — an all-boilerplate doc aggregates to
            # an empty array, not to a missing group
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_is_boiler").isNull(), F.struct("pos", "seg"))
                )
            ).alias("_segs"),
            F.sum(F.when(F.col("_is_boiler"), 1).otherwise(0)).alias("n_removed"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("host").alias(host_col),
            F.array_join(F.col("_segs.seg"), ". ").alias("clean_text"),
            "n_removed",
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules (public web-corpus filtering heuristics:
# Gopher / RefinedWeb / CCNet family). All pure column math.
# ---------------------------------------------------------------------------


def _gopher_tokens(text_col):
    """Tokenizer shared by the four Gopher rule helpers. NB: deliberately
    NOT tokens() — empty text splits to [''] (size 1), the semantics the
    hand-written DuckDB gate twins mirror (string_split('') = ['']); the
    empty case is separately handled inside each rule (mean_word_length
    pins 0.0, repetition needs >= n tokens, the ratios divide by
    greatest(size, 1)), so the ['']-vs-[] difference never leaks into a
    rule verdict."""
    from pyspark.sql import functions as F

    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")


def mean_word_length(text_col):
    """Mean token length over whitespace tokens (0 for empty text)."""
    from pyspark.sql import functions as F

    toks = _gopher_tokens(text_col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n = F.size(toks)
    empty = F.trim(text_col) == ""
    return F.when(empty, F.lit(0.0)).otherwise(total / n)


def repetition_ratio(text_col, n: int = 2):
    """1 - distinct n-grams / total n-grams over word n-grams — high values
    mark boilerplate-ish repetitive text (the Gopher duplicate-n-gram rule).
    0 when fewer than n tokens."""
    from pyspark.sql import functions as F

    toks = _gopher_tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    enough = F.size(toks) >= n
    return F.when(
        enough, 1.0 - F.size(F.array_distinct(grams)) / F.size(grams)
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(text_col, symbols: str = "#…"):
    """Symbol occurrences per word (the Gopher symbol-to-word rule)."""
    from pyspark.sql import functions as F

    cls = "".join("\\" + c for c in symbols)
    n_sym = F.length(text_col) - F.length(F.regexp_replace(text_col, f"[{cls}]", ""))
    toks = _gopher_tokens(text_col)
    return n_sym / F.greatest(F.size(toks), F.lit(1))


def alpha_word_ratio(text_col):
    """Fraction of tokens containing at least one alphabetic character
    (the Gopher 80%-alpha-words rule)."""
    from pyspark.sql import functions as F

    toks = _gopher_tokens(text_col)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    return n_alpha / F.greatest(F.size(toks), F.lit(1))


def gopher_quality(text_col, min_words: int = 50, max_words: int = 100_000,
                   max_mean_word_len: float = 10.0, max_symbol_ratio: float = 0.1,
                   min_alpha_ratio: float = 0.8, max_repetition: float = 0.3):
    """The combined pass/fail rule bundle. Returns a boolean Column."""
    from pyspark.sql import functions as F

    n = token_count(text_col)
    return (
        (n >= min_words)
        & (n <= max_words)
        & (mean_word_length(text_col) <= max_mean_word_len)
        & (symbol_word_ratio(text_col) <= max_symbol_ratio)
        & (alpha_word_ratio(text_col) >= min_alpha_ratio)
        & (repetition_ratio(text_col) <= max_repetition)
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction pass)
# ---------------------------------------------------------------------------
# Patterns are deliberately restricted to syntax with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# quantifiers, non-capturing groups, ASCII \b — no lookaround, no backrefs.
# Order matters (emails are scrubbed before phones so the digits inside an
# already-replaced token can't re-match); both engines apply the same chain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b",
        "<IP>",
    ),
    ("phone", r"\+[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
    # domestic formats without an international prefix — (415) 555-0199 and
    # 415-555-0199 / 415.555.0199. The 3-3-4 digit-group shape doesn't
    # collide with dates (4-2-2) or IPv4s (already scrubbed above).
    ("phone_paren", r"\(\d{3}\) ?\d{3}[- ]\d{4}", "<PHONE>"),
    ("phone_sep", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_counts(text_col) -> list[Column]:
    """One long Column per PII kind: occurrences BEFORE scrubbing (redaction
    audit metric). Counted on the same sequentially-scrubbed input each
    pattern would see, so counts and replacements agree."""
    cols = []
    cur = text_col if isinstance(text_col, Column) else F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return cols


def scrub_pii(text_col) -> Column:
    """Text with every PII match replaced by its placeholder — pure JVM
    regexp_replace chain (codegen; no Python in the hot path)."""
    cur = text_col if isinstance(text_col, Column) else F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def scrub_pii_sql(expr: str) -> tuple[str, list[str]]:
    """(scrubbed_expr, [count_exprs...]) — the DuckDB twin of
    scrub_pii/pii_counts built from the SAME pattern table (regexp_replace
    with the 'g' flag; counts via len(regexp_extract_all))."""
    cur = expr
    counts = []
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{p}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    return cur, counts
