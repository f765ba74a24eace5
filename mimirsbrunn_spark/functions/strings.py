"""String/text expression library — the reference's analyzer + label family
(SURVEY.md §2.8 T1–T16) as reusable JVM-side column expressions.

The reference implements these as Elasticsearch analyzer config
(/root/reference/config/addr_settings.json:6-68) and Rust label formatters
(/root/reference/src/labels.rs); here each is a composable Column function
that stays inside whole-stage codegen. Only full-Unicode accent folding
drops to an Arrow-batched pandas UDF (the ICU analog).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# T10: lowercase + asciifolding ("word" analyzer, addr_settings.json:26-31).
# JVM fast path: translate() covering Latin-1/Latin-Extended accents.
_ACC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăąćčďđēėęěğīįıłńňōőœřśšťūůűźżž"
_PLAIN = "aaaaaaceeeeiiiinooooouuuuyyaaaccddeeeegiiilnnoooorsstuuuzzz"
_ACC += _ACC.upper()
_PLAIN += _PLAIN.upper()


def fold_ascii(col) -> Column:
    """Accent-strip via translate (covers Latin accents; JVM-side)."""
    return F.translate(col, _ACC, _PLAIN)


def normalize_word(col) -> Column:
    """The "word" analyzer: lowercase + asciifold + trim."""
    return F.trim(fold_ascii(F.lower(col)))


def _fold_unicode_batch(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: None
        if x is None
        else "".join(c for c in unicodedata.normalize("NFKD", x) if not unicodedata.combining(c))
    )


def fold_unicode_udf():
    """Full-Unicode NFKD accent folding (ICU analog) — Arrow-batched pandas
    UDF, built lazily (registration needs an active session)."""
    return pandas_udf(_fold_unicode_batch, "string")


# T14: elision — strip French articles l'/d' (+ qu', j', etc.) per token
# (addr_settings.json:20-23,44-49)
def strip_elision(token_col) -> Column:
    return F.regexp_replace(token_col, r"^(l|d|j|t|s|m|n|qu)'", "")


# T11/T12: edge-ngrams + ngrams (addr_settings.json:6-15) as array builders
def edge_ngrams_expr(text_col: str, min_n: int = 1, max_n: int = 20) -> Column:
    """Edge-ngram prefix set (T11): ['p','pa','par',...] up to max_n."""
    return F.expr(
        f"transform(sequence({min_n}, least(length({text_col}), {max_n})),"
        f" i -> substring({text_col}, 1, i))"
    )


def ngrams_expr(text_col: str, n: int = 3) -> Column:
    """Character n-gram set (T12, the fuzzy index)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> substring({text_col}, i, {n})))"
    )


# T13: synonym expansion (rubber.rs:49-67 — 'bd'→'boulevard' etc.)
DEFAULT_SYNONYMS = {
    "bd": "boulevard",
    "av": "avenue",
    "r": "rue",
    "rte": "route",
    "pl": "place",
    "st": "saint",
    "ste": "sainte",
    "cc": "centre commercial",
    "gare sncf": "gare",
}


def _split_synonyms(synonyms: dict | None) -> tuple[dict, dict]:
    """Partition pairs into token-level (single-word key AND value) and
    string-level (either side multi-word) — a multi-word key can never match
    a single token, and a multi-word value must go through tokenization."""
    syn = synonyms or DEFAULT_SYNONYMS
    token_level = {k: v for k, v in syn.items() if " " not in k and " " not in v}
    string_level = {k: v for k, v in syn.items() if " " in k or " " in v}
    return token_level, string_level


def apply_multiword_synonyms(text_col, synonyms: dict | None = None) -> Column:
    """String-level synonym pass for multi-word pairs, applied BEFORE
    tokenization: each key is replaced on word boundaries (the ES
    multi-token synonym graph analog, rubber.rs:49-67). Longer keys run
    first so 'gare sncf' wins over a hypothetical 'gare' key."""
    _, string_level = _split_synonyms(synonyms)
    out = text_col
    for k in sorted(string_level, key=len, reverse=True):
        # Quote the key (\Q..\E — user-supplied synonyms may contain regex
        # metacharacters) and escape $ / \ in the replacement (group-ref
        # syntax in Java's replaceAll). Lookarounds instead of \b: a key
        # edge may itself be a non-word char (e.g. 'c++'), where \b would
        # demand a word char next door and never match.
        repl = string_level[k].replace("\\", "\\\\").replace("$", "\\$")
        out = F.regexp_replace(out, rf"(?<!\w)\Q{k}\E(?!\w)", repl)
    return out


def expand_synonyms(tokens_col, synonyms: dict | None = None) -> Column:
    """Token-level synonym map (single-word pairs only — multi-word pairs
    are handled by apply_multiword_synonyms before tokenization)."""
    token_level, _ = _split_synonyms(synonyms)
    mapping = F.map_from_arrays(
        F.array(*[F.lit(k) for k in token_level]),
        F.array(*[F.lit(v) for v in token_level.values()]),
    )
    return F.transform(tokens_col, lambda t: F.coalesce(mapping.getItem(t), t))


def synonym_tokens(text_col, synonyms: dict | None = None) -> Column:
    """Full T13 pipeline: multi-word string pass → tokenize → token map.
    Token counts stay consistent because multi-word replacements are split
    by the tokenizer, not injected into existing tokens."""
    expanded = apply_multiword_synonyms(text_col, synonyms)
    toks = F.split(F.trim(F.regexp_replace(expanded, r"\s+", " ")), " ")
    return expand_synonyms(toks, synonyms)


# T3: i18n label with language fallback (labels.rs:28-41,92-118)
def i18n_label(labels_map_col, lang_col, default_col) -> Column:
    """labels['<lang>'] if present else the default label."""
    return F.coalesce(F.element_at(labels_map_col, lang_col), default_col)


# T2/T4: label formatting "{name} ({city})" / "{street} {hn}"
def format_label(name_col, context_col) -> Column:
    return F.when(
        context_col.isNull() | (context_col == ""), name_col
    ).otherwise(F.concat(name_col, F.lit(" ("), context_col, F.lit(")")))


# T5/T6: zip split/join
def split_zips(col) -> Column:
    return F.split(col, ";")


def join_zips(col) -> Column:
    return F.array_join(col, ";")


# T7: code slice + leading-zero trim (bano2mimir.rs:66-74)
def insee_prefix(col, n: int = 5) -> Column:
    return F.regexp_replace(F.substring(col, 1, n), "^0+", "")


# T8: id sanitization (strip ws, map /.:; → '-')
def sanitize_id(col) -> Column:
    return F.regexp_replace(F.regexp_replace(col, r"\s+", ""), r"[/.:;]", "-")


# T9: coord-precision id "{lon:.6};{lat:.6}"
def coord_id(lon_col, lat_col) -> Column:
    return F.format_string("%.6f;%.6f", lon_col, lat_col)


# T16: snake_case
def snake_case(col) -> Column:
    return F.lower(F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1_$2"))


# O3: natural sort key — "line 3" < "line 11" (ntfs2mimir.rs:78-92):
# split on digit/non-digit boundaries, zero-pad digit runs to fixed width, so
# lexicographic order == natural order.
def natural_sortkey_expr(text_col: str) -> Column:
    return F.expr(
        "array_join(transform("
        f"  split(lower({text_col}), '(?<=[0-9])(?=[^0-9])|(?<=[^0-9])(?=[0-9])'),"
        "  t -> CASE WHEN t RLIKE '^[0-9]+$' THEN lpad(t, 12, '0') ELSE t END), '')"
    )
