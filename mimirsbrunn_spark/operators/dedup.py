"""Deduplication operators for a large-scale training-data pipeline.

Five families (all over a ``documents(doc_id, text, ...)`` table):

- exact            — hash groupBy (md5 of normalized text)
- minhash_lsh      — shingle → k minhashes → b bands → bucket self-join →
                     exact-Jaccard verify (the scale path: candidate pairs
                     only ever meet inside an LSH bucket, never cross-join)
- simhash          — 64-bit simhash via JVM-side token hashing + a vectorized
                     numpy bit-vote kernel in a pandas UDF
- ngram_jaccard    — character-n-gram Jaccard verify for candidate pairs
- embedding cosine — near-duplicate pairs via random-hyperplane LSH buckets
                     over an embedding column, cosine verify (see similarity.py)

Scale notes: every stage is groupBy/join on hashed keys (uniform, no skew);
band buckets bound the verify fan-out — a bucket with B docs yields B(B−1)/2
candidate pairs, so pathological buckets are capped (``max_bucket``) and the
cap is logged, never silent.

Reference analogs: street dedup by (name, city) keep-min-id
(/root/reference/src/osm_reader/street.rs:202-246) = the exact family;
admin INSEE dedup first-wins (src/osm_reader/admin.rs:122-136) = keep-first
policy; the n-gram fuzzy-match analyzer (config/addr_settings.json:11-15,
libs/bragi/src/query.rs:346-376 minimum_should_match ladder) = the n-gram
Jaccard family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized(col):
    """Pinned normalization: lowercase, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# ---------------------------------------------------------------------------
# hash families
# ---------------------------------------------------------------------------
# xxhash64: the production hash (JVM intrinsic, fastest).
# md5_60:   60-bit hash from the md5 hex prefix — chosen because DuckDB can
#           compute the identical value (('0x' || substr(md5(s),1,15))::BIGINT),
#           making the minhash/simhash gate queries value-verifiable against a
#           DuckDB oracle (CORRECTNESS gate). 60 bits keeps the value positive
#           in a signed int64 on both engines (no ANSI overflow).


def hash_col(col, hasher: str = "xxhash64"):
    """64-bit (or 60-bit) integer hash of a string column."""
    if hasher == "xxhash64":
        return F.xxhash64(col)
    if hasher == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hasher {hasher!r}")


def hash_lambda_sql(hasher: str = "xxhash64") -> str:
    """The same hash as a SQL-expression template over placeholder `%s`
    (used inside F.expr transform lambdas)."""
    if hasher == "xxhash64":
        return "xxhash64(%s)"
    if hasher == "md5_60":
        return "cast(conv(substring(md5(%s), 1, 15), 16, 10) as bigint)"
    raise ValueError(f"unknown hasher {hasher!r}")


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_groups(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group_ids: int | None = None,
) -> DataFrame:
    """(fp, n_docs, keep_id, dup_ids): one row per duplicate group (n ≥ 2).
    keep = min id (arg-min, deterministic).

    ``dup_ids`` buffers the WHOLE group in one aggregation row; a
    boilerplate page duplicated across millions of docs would OOM that
    task. ``max_group_ids`` caps the ids LISTED per group (the smallest N —
    deterministic) while n_docs/keep_id stay exact over the full group;
    None (default) keeps the complete listing, the small-scale/oracle
    shape. For pure dedup (no listing at all) use exact_dedup — it never
    materializes groups."""
    base = documents.select(
        F.col(id_col).alias("id"), F.md5(normalized(F.col(text_col))).alias("fp")
    )
    listed = F.col("id")
    if max_group_ids is not None:
        from pyspark.sql import Window

        rn = F.row_number().over(Window.partitionBy("fp").orderBy("id"))
        base = base.withColumn("_rn", rn)
        listed = F.when(F.col("_rn") <= max_group_ids, F.col("id"))
    return (
        base.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("id").alias("keep_id"),
            F.array_sort(F.collect_list(listed)).alias("dup_ids"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one doc (min id) per normalized-text fingerprint."""
    w_fp = F.md5(normalized(F.col(text_col)))
    ranked = documents.withColumn("_fp", w_fp)
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("_fp").orderBy(F.col(id_col)))
    return ranked.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_fp", "_rn")


# ---------------------------------------------------------------------------
# shingles + minhash (built-in expressions, JVM-side)
# ---------------------------------------------------------------------------


def shingles(text_col: str, n: int = 3):
    """Word n-gram shingle set of normalized text (distinct, built-ins only)."""
    toks = f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n}))))"
    )


def minhash_signature(shingle_col, k: int = 32, hasher: str = "xxhash64"):
    """k minhashes: min over shingles of hash(seed_i ⊕ shingle). One JVM
    expression per hash — no UDF, no shuffle."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col,
                    lambda s, i=i: hash_col(F.concat(F.lit(f"mh{i}:"), s), hasher),
                )
            )
            for i in range(k)
        ]
    )


def _banded(
    documents: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    bands: int,
    shingle_n: int,
    hasher: str,
):
    """Shared LSH band construction: (docs-with-shingles, (id, band, bucket)
    rows). Used by minhash_candidates (the pair generator) and
    minhash_dropped_buckets (the coverage-loss report) so both see the
    identical bucketing."""
    rows_per_band = k // bands
    d = documents.select(
        F.col(id_col).alias("id"),
        shingles(text_col, shingle_n).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), k, hasher))

    # Band rows carry ONLY (id, band, bucket) — ~24 bytes/row. The shingle
    # arrays (KBs/doc) must NOT ride the bands×N explode through the bucket
    # shuffle; at 100 TB that would multiply shuffle volume by bands × the
    # shingle payload. Shingles are re-joined below for the (tiny) surviving
    # candidate set only — the same shape ngram_jaccard_pairs uses.
    banded = d.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hash_col(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            ),
                            hasher,
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return d, banded


def minhash_candidates(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) + exact Jaccard over shingle sets.

    band hash = xxhash64 of the band's slice of the signature; docs sharing
    any band bucket become candidates; buckets larger than ``max_bucket``
    are dropped — they are near-certain boilerplate clusters handled by
    exact dedup. The drop is NOT observable from this function's output;
    run ``minhash_dropped_buckets`` (same bucketing, one aggregate) to see
    exactly which buckets the cap removed and how many ids each held."""
    d, banded = _banded(documents, id_col, text_col, k, bands, shingle_n, hasher)

    from pyspark.sql import Window

    sized = banded.withColumn(
        "_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("_bn") <= max_bucket)

    a = sized.select("band", "bucket", F.col("id").alias("id_a"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = d.select("id", "sh")
    pairs = pairs.join(
        sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
    ).join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
    )


def minhash_dropped_buckets(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Coverage-loss report for the ``max_bucket`` cap: (band, bucket,
    n_ids) for every bucket minhash_candidates silently dropped with the
    same parameters. Empty result = the cap removed nothing. Run this when
    tuning thresholds/bands so a misconfiguration that drops most candidate
    mass is visible instead of looking like clean data."""
    _, banded = _banded(documents, id_col, text_col, k, bands, shingle_n, hasher)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .filter(F.col("n_ids") > max_bucket)
    )


def minhash_dedup_pairs(documents: DataFrame, threshold: float = 0.8, **kw) -> DataFrame:
    return minhash_candidates(documents, **kw).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# simhash (hybrid: JVM token hashing → vectorized numpy bit vote)
# ---------------------------------------------------------------------------

def _simhash_batch(it):
    for pdf in it:
        out = np.empty(len(pdf), dtype=np.int64)
        for i, hashes in enumerate(pdf["token_hashes"]):
            if hashes is None:  # NULL text → NULL token array: simhash 0,
                out[i] = 0      # same as empty text (exact family parity)
                continue
            h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
            if len(h) == 0:
                out[i] = 0
                continue
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(h)  # +1 / −1 per token per bit
            sim_bits = (votes > 0).astype(np.uint64)
            sim = (sim_bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            # explicit wrapping uint64→int64 cast: np.int64(x) with bit 63
            # set raises OverflowError on numpy >= 2 (silent wrap on 1.x)
            out[i] = np.uint64(sim).astype(np.int64)
        yield pd.DataFrame({"id": pdf["id"], "simhash": out})


def simhash(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
) -> DataFrame:
    """64-bit simhash per doc. Token hashing stays JVM-side (a hash intrinsic
    in a transform); only the bit-vote reduction crosses into numpy via
    mapInPandas (Arrow-batched, vectorized over the 64-bit axis)."""
    h = hash_lambda_sql(hasher) % "t"
    toks = F.expr(
        f"transform(split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' '),"
        f" t -> {h})"
    )
    d = documents.select(F.col(id_col).alias("id"), toks.alias("token_hashes"))
    return d.mapInPandas(_simhash_batch, schema="id long, simhash long")


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming, using
    4-block LSH (two docs within distance 3 share at least one of 4 16-bit
    blocks — pigeonhole): block equi-join, then popcount verify via bit_count."""
    sh = simhash(documents, **kw)
    blocks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val"))
    a = blocks.select("blk", "val", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = blocks.select("blk", "val", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# character-n-gram Jaccard (verify primitive)
# ---------------------------------------------------------------------------


def char_ngrams(text_col: str, n: int = 3):
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> substring({text_col}, i, {n})))"
    )


# ---------------------------------------------------------------------------
# connected components: near-dup pairs → duplicate clusters
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``, where component
    = min id reachable through the pair graph — iterative min-label
    propagation (the standard large-graph CC without GraphX/graphframes:
    each round every vertex takes the min label among itself and its
    neighbors; converges in O(graph diameter) rounds, which for dedup
    clusters is tiny).

    Driver-side control flow costs ONE materializing action per
    ``checkpoint_every``-round BATCH: intermediate rounds are planned
    lazily (no action at all — their shuffles collapse into the batch's
    single job), the batch boundary is an eager ``localCheckpoint`` (which
    also cuts the otherwise unbounded iterative lineage), and the
    convergence probe then runs limit(1) over the already-materialized
    checkpoint partitions — near-free. The check is FOLDED into the label
    aggregation itself: each vertex's own row carries its previous label
    through the union, so the round's single groupBy emits both the new
    label (min) and the old one (max of the non-null carrier) — no
    old-vs-new join. Probing only the batch's LAST round is sound because
    propagation is monotone: a round with zero changes is a fixpoint, and
    a batch that crosses the fixpoint makes its trailing rounds no-ops, so
    its last round always reports converged. At worst the batch runs
    ``checkpoint_every - 1`` no-op rounds past the fixpoint — the price of
    1/checkpoint_every as many jobs.

    Scale: each round is one shuffle keyed by vertex id over |V|+|E| rows —
    no collect; a 10^9-edge pair set runs the same plan."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    comp_type = labels.schema["component"].dataType
    for i in range(max_iter):
        own = labels.select("id", "component", F.col("component").alias("_old"))
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"),
            "component",
            F.lit(None).cast(comp_type).alias("_old"),
        )
        merged = own.unionByName(prop).groupBy("id").agg(
            F.min("component").alias("component"),
            # every id has exactly one own row; max ignores the neighbor NULLs
            F.max("_old").alias("_old"),
        )
        labels = merged.drop("_old")
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            # batch boundary: the ONE materializing action, then a probe
            # over the cached checkpoint partitions
            merged = merged.localCheckpoint(eager=True)
            labels = merged.drop("_old")
            changed = (
                merged.filter(F.col("component") != F.col("_old")).limit(1).count()
            )
            if changed == 0:
                break
    return labels


def dedup_clusters(
    documents: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    **minhash_kw,
) -> DataFrame:
    """End-to-end near-dup clustering: minhash LSH pairs → connected
    components → (id, keep_id) where keep_id = the cluster's min id (the
    reference's keep-min-id policy, street.rs:202-246). Docs with no
    near-dup partner are absent (they keep themselves)."""
    pairs = minhash_dedup_pairs(documents, threshold=threshold, id_col=id_col, **minhash_kw)
    return connected_components(pairs).select(
        F.col("id").alias(id_col), F.col("component").alias("keep_id")
    )


def ngram_jaccard_pairs(candidates: DataFrame, docs: DataFrame, id_col="doc_id", text_col="text", n=3) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs with char-n-gram Jaccard."""
    g = docs.select(F.col(id_col).alias("id"), char_ngrams(text_col, n).alias("ng"))
    return (
        candidates.join(g.withColumnRenamed("id", "id_a").withColumnRenamed("ng", "ng_a"), "id_a")
        .join(g.withColumnRenamed("id", "id_b").withColumnRenamed("ng", "ng_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("ng_a", "ng_b"))
                / F.greatest(F.size(F.array_union("ng_a", "ng_b")), F.lit(1))
            ).alias("ngram_jaccard"),
        )
    )
