"""Real BPE token counting vs an independent pure-python reference
implementation (the published algorithm: find the min-rank pair present,
merge ALL its occurrences left-to-right, repeat), on crafted and seeded
random corpora — plus learn_merges determinism and the broadcast path."""

import random

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators import bpe
from mimirsbrunn_spark.operators.bpe import _EOW, GATE_MERGES


# --- independent reference (different algorithm shape than production) ------

def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    sym = list(word[:-1]) + [word[-1] + _EOW]
    while True:
        present = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        cand = [p for p in present if p in ranks]
        if not cand:
            return sym
        best = min(cand, key=ranks.get)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out


def ref_count(text: str, merges) -> int:
    return sum(len(ref_encode(w, merges)) for w in bpe._words(text or ""))


def test_encode_word_crafted():
    ranks = {tuple(m): i for i, m in enumerate(GATE_MERGES)}
    assert bpe.encode_word("the", ranks) == ("the" + _EOW,)
    assert bpe.encode_word("and", ranks) == ("and" + _EOW,)
    # unseen word: no merges apply beyond what ranks cover
    assert bpe.encode_word("x", ranks) == ("x" + _EOW,)
    assert bpe.encode_word("", ranks) == ()
    # 'thethe' -> th+e / th+e</w>? interior 'e' has no EOW: t,h,e,t,h,e</w>
    got = bpe.encode_word("thethe", ranks)
    assert got == ("th", "e", "the" + _EOW)


def test_spark_udf_matches_reference_crafted(spark):
    texts = [
        "the cat and the hat", "To be, or not to be: THAT is the question",
        "ingesting interesting things", "", None, "aaaa aaa aa a",
        "punctuation-heavy!!! text... with 123 numbers and under_scores",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = bpe.with_bpe_tokens(df, GATE_MERGES).orderBy("id").collect()
    for row, t in zip(out, texts):
        assert row.bpe_tokens == ref_count(t, GATE_MERGES), t


def test_spark_udf_matches_reference_random(spark):
    rng = random.Random(1234)
    alpha = "abcdet "
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 160)))
             for _ in range(200)]
    merges = bpe.learn_merges(texts[:100], n_merges=60)
    assert len(merges) > 10
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = bpe.with_bpe_tokens(df, merges).orderBy("id").collect()
    for row, t in zip(out, texts):
        assert row.bpe_tokens == ref_count(t, merges), repr(t)


def test_learn_merges_deterministic_and_compressing():
    corpus = ["the quick brown fox jumps over the lazy dog"] * 5 + [
        "pack my box with five dozen liquor jugs",
        "the thick thorny thicket thins there",
    ]
    m1 = bpe.learn_merges(corpus, n_merges=80)
    m2 = bpe.learn_merges(list(corpus), n_merges=80)
    assert m1 == m2
    # more merges never increase the token count; chars are the ceiling
    chars = sum(len(w) for t in corpus for w in bpe._words(t))
    words = sum(len(bpe._words(t)) for t in corpus)
    n_none = sum(ref_count(t, []) for t in corpus)
    n_full = sum(ref_count(t, m1) for t in corpus)
    assert n_none == chars
    assert words <= n_full < n_none


def test_broadcast_path_equals_closure_path(spark):
    df = spark.createDataFrame(
        [(i, "the interesting thing is that it is the thing") for i in range(50)],
        "id long, text string",
    )
    a = bpe.with_bpe_tokens(df, GATE_MERGES).agg(F.sum("bpe_tokens")).first()[0]
    b = bpe.with_bpe_tokens(df, GATE_MERGES, spark=spark).agg(
        F.sum("bpe_tokens")).first()[0]
    assert a == b
