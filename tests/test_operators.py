"""Training-data operator tests: dedup family, similarity search, text
analysis, multimodal plumbing — each verified against a small independent
pure-Python oracle computed on the driver."""

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    long_a = (
        "The quick brown fox jumps over the lazy dog while the calm river "
        "flows past the old stone bridge in the quiet morning light of autumn"
    )
    long_b = long_a.replace("jumps", "leaps")  # one word changed → high Jaccard
    rows = [
        (1, long_a, "en"),
        (2, long_a, "en"),  # exact dup of 1
        (3, long_a.replace("  ", " ").upper().lower() + " ", "en"),  # dup after norm
        (4, long_b, "en"),  # near-dup
        (5, "Der schnelle braune Fuchs springt und ist weg", "de"),
        (6, "completely different text about spark engines and rollups", "en"),
        (7, "", "unknown"),
        (8, "le chat est sur la table et les chiens sont dehors", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    groups = dedup.exact_groups(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_docs == 3 and g.keep_id == 1 and g.dup_ids == [1, 2, 3]
    kept = dedup.exact_dedup(docs)
    assert kept.count() == 6
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {1, 4, 5, 6, 7, 8}


def test_minhash_lsh_finds_near_dup(docs):
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.5, k=32, bands=16).collect()
    pairset = {(r.id_a, r.id_b) for r in pairs}
    # exact dups and the one-word-changed near-dup must be found
    assert (1, 2) in pairset and (1, 3) in pairset and (2, 3) in pairset
    assert (1, 4) in pairset or (2, 4) in pairset
    # unrelated docs must not pair
    assert not any(6 in p or 8 in p for p in pairset)
    # jaccard for exact dup pair is 1.0
    j12 = [r.jaccard for r in pairs if (r.id_a, r.id_b) == (1, 2)][0]
    assert j12 == 1.0


def test_simhash_hamming(docs):
    sh = {r.id: r.simhash for r in dedup.simhash(docs).collect()}
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sh[1], sh[2]) == 0  # identical text
    assert ham(sh[1], sh[4]) <= 12  # near-dup is close
    assert ham(sh[1], sh[6]) > 12  # unrelated is far
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs


def test_ngram_jaccard_verify(docs, spark):
    cands = spark.createDataFrame([(1, 4), (1, 6)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.ngram_jaccard for r in dedup.ngram_jaccard_pairs(cands, docs).collect()}
    assert out[(1, 4)] > 0.6 > out[(1, 6)]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[7] = base[3] + rng.standard_normal(16).astype(np.float32) * 0.01  # near-dup pair
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_brute_force_topk_matches_numpy(emb):
    df, base = emb
    q = base[0].astype(np.float64)
    cos = (base.astype(np.float64) @ q) / (
        np.linalg.norm(base.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    want = sorted(range(40), key=lambda i: (-cos[i], i))[:5]
    got = [r.id for r in similarity.brute_force_topk(df, list(base[0]), k=5).collect()]
    assert got == want


def test_lsh_topk_contains_true_top1(emb):
    df, base = emb
    got = [r.id for r in similarity.lsh_topk(df, list(base[3]), k=5, multiprobe_bits=2).collect()]
    assert 3 in got and 7 in got  # query itself + its planted near-dup


def test_embedding_near_dup_pairs(emb):
    df, _ = emb
    pairs = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert (3, 7) in pairs
    assert len(pairs) <= 3  # no spurious explosion


def test_text_analysis_oracle(docs):
    out = {r.doc_id: r for r in text.analyze(docs).collect()}
    for r_id in (1, 6, 7):
        txt = out[r_id].text
        toks = [t for t in re.split(r"\s+", txt.strip().lower()) if t != ""] if txt.strip() else []
        assert out[r_id].n_tokens == len(toks)
        if toks:
            sw = sum(1 for t in toks if t in text.STOPWORDS) / len(toks)
            assert abs(out[r_id].stopword_ratio - sw) < 1e-12
        punct = sum(1 for c in txt if c in ".,!?;:") / max(len(txt), 1)
        assert abs(out[r_id].punct_ratio - punct) < 1e-12
        assert out[r_id].fp == hashlib.md5(txt.encode()).hexdigest()
    assert out[1].lang_pred == "en"
    assert out[5].lang_pred == "de"
    assert out[8].lang_pred == "fr"
    assert out[7].lang_pred == "unknown"
    assert 0.0 <= out[1].quality <= 1.0


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, n=30)
    feats = multimodal.image_features(media, fake=True).collect()
    assert len(feats) == len([r for r in media.collect() if r.kind == "image"])
    for r in feats:
        assert len(r.feat) == 8
        assert abs(sum(r.feat) - 1.0) < 1e-5
    # determinism across runs
    feats2 = multimodal.image_features(media, fake=True).collect()
    assert {r.media_id: list(r.feat) for r in feats} == {
        r.media_id: list(r.feat) for r in feats2
    }
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True)
    got = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    durs = {r.media_id: r.duration_ms for r in media.collect() if r.kind == "video"}
    for r in got:
        assert r.n == max(durs[r.media_id] // 1000, 1)
    # real decoder path is explicitly stubbed
    with pytest.raises(Exception):
        multimodal.image_features(media, fake=False).collect()


def test_ivf_topk(emb):
    df, base = emb
    cents = similarity.ivf_train(df, k=4, iters=3)
    assert cents.shape == (4, 16)
    got = [r.id for r in similarity.ivf_topk(df, list(base[3]), cents, k=5, nprobe=2).collect()]
    assert 3 in got and 7 in got  # query + planted near-dup recovered
    # full-probe IVF == brute force exactly
    full = [r.id for r in similarity.ivf_topk(df, list(base[0]), cents, k=5, nprobe=4).collect()]
    brute = [r.id for r in similarity.brute_force_topk(df, list(base[0]), k=5).collect()]
    assert full == brute
