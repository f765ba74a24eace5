"""Merges-table-driven byte-pair encoding — real BPE token counting for
training-data budgeting (VERDICT r4 task 5: token budgets are the unit of
account of a data pipeline; the regex heuristic ``text.bpe_ish_token_count``
stays as the cheap codegen'd estimator, this module is the exact counter).

Algorithm: the standard (Sennrich 2016 / GPT-2) word-level BPE. A word is
pre-tokenized by the same normalization the rest of the pipeline uses
(lower, non-alphanumeric → space), split to characters with an end-of-word
marker on the last symbol, then the lowest-rank adjacent pair from the
merges table is merged repeatedly until no adjacent pair has a rank. Token
count of a document = sum of per-word symbol counts.

Scale shape: the merges table is tokenizer-sized (10^4-10^5 pairs) →
shipped once per executor via ``SparkContext.broadcast``; execution is an
Arrow-batched pandas UDF (one Python invocation per ~10k-row batch, not
per row) with an LRU word cache — under Zipf's law the cache hit rate on
web text is >95%, so the per-batch cost is dominated by the few unseen
words. There is no shuffle: token counting is a map.

``learn_merges`` trains a deterministic tiny merges table from a sample
corpus (most-frequent-pair greedy loop, ties broken lexicographically) —
used by tests and the ``bpe_tokens`` gate; production merges come from the
tokenizer's published merges file.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EOW = "</w>"
_NORM = re.compile(r"[^a-z0-9]+")


def _words(text: str) -> list[str]:
    return [w for w in _NORM.sub(" ", text.lower()).split() if w]


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def _merge_word(sym: tuple[str, ...], ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply merges lowest-rank-first until fixpoint (the canonical loop)."""
    sym = list(sym)
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    if not word:
        return ()
    return _merge_word(_symbols(word), ranks)


def learn_merges(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Deterministic BPE training on a (small, driver-side) sample: greedy
    most-frequent adjacent pair, ties broken by the pair itself. Intended
    for tests/gates and bootstrap — production uses a published merges
    file."""
    vocab = Counter()
    for t in texts:
        for w in _words(t or ""):
            vocab[_symbols(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_vocab = Counter()
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab
    return merges


def bpe_token_count_udf(
    merges: list[tuple[str, str]],
    spark=None,
    cache_size: int = 1 << 16,
):
    """Arrow-batched pandas UDF: exact BPE token count per text. Pass
    ``spark`` to ship the merges via a real SparkContext broadcast (one
    copy per executor); without it the ranks dict rides the serialized
    closure (fine for tokenizer-sized tables, both are one copy per
    worker process)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks) if spark is not None else None

    @pandas_udf("long")
    def count(texts: pd.Series) -> pd.Series:
        r = bc.value if bc is not None else ranks
        cache: dict[str, int] = {}

        def doc_count(t) -> int:
            if t is None:
                return 0
            n = 0
            for w in _words(t):
                c = cache.get(w)
                if c is None:
                    c = len(_merge_word(_symbols(w), r))
                    if len(cache) < cache_size:
                        cache[w] = c
                n += c
            return n

        return texts.map(doc_count)

    return count


def with_bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    spark=None,
) -> DataFrame:
    return df.withColumn(
        out_col, bpe_token_count_udf(merges, spark=spark)(F.col(text_col))
    )


# Tiny fixed merges table for the rows-only driver gate: deterministic,
# English-biased, independent of the input corpus (so the gate pins the
# ENCODER, not the training loop).
GATE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e" + _EOW), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("an", "d" + _EOW), ("e", "n"), ("o", "r"),
    ("s", "t"), ("a", "t"), ("o", "f" + _EOW),
    ("in", "g" + _EOW), ("t", "o" + _EOW), ("e", "s" + _EOW), ("a", "l"),
    ("i", "s" + _EOW), ("i", "t" + _EOW),
]
