"""Similarity search over an embedding column (``array<float>``).

- brute-force cosine top-k: exact baseline — JVM-side fold (zip_with +
  aggregate), no Python in the loop, one narrow shuffle for the global top-k;
- random-hyperplane LSH buckets: the scale path — deterministic seeded
  hyperplanes (numpy, broadcast as literal arrays), sign-bit signature,
  bucket equi-join probe; optional multi-probe by flipping signature bits;
- embedding near-dup pairs: bucket self-join + cosine verify (the
  "embedding-cosine near-dup" dedup family).

Scale: brute force scans all N rows per query (fine as a verify/baseline);
LSH probes only matching buckets — at 10^12 docs the bucket join is a
broadcast of the query signatures against a bucketed, pre-partitioned table.

Reference analog: the two-phase envelope-then-exact spatial join
(/root/reference/src/admin_geofinder.rs:105-251) — coarse bucket prefilter,
exact verify inside the bucket; and reverse-geocode top-1-per-probe
(libs/mimir/src/rubber.rs:513-547).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector. Ties broken by id (stable)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("id"), cosine_col(F.col(vec_col), q)
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic seeded random hyperplanes (public LSH construction)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_col(vec_col, planes: np.ndarray):
    """Sign-bit LSH signature as a long: bit i = 1 iff dot(vec, plane_i) > 0.
    Planes are literal arrays — pure JVM expression, no UDF."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _probe_set(query_vec, planes, multiprobe_bits: int) -> set[int]:
    """Driver-side query signature + its Hamming ball (multiprobe LSH).
    The ONE implementation both the unindexed and the indexed probe use —
    drift between them would make the index disagree with its baseline.
    The dot product is a sequential left-to-right double sum — the same
    accumulation order as the engine-side fold (and DuckDB's
    list_inner_product), so the sign of a near-zero dot product can't
    disagree across engines. Supports multiprobe_bits in {0, 1, 2}."""
    if multiprobe_bits not in (0, 1, 2):
        raise ValueError(f"multiprobe_bits must be 0, 1 or 2, got {multiprobe_bits}")
    n_planes = len(planes)
    qsig = int(
        sum(
            (1 << i)
            for i, p in enumerate(planes)
            if sum(float(a) * float(b) for a, b in zip(query_vec, p)) > 0
        )
    )
    probes = {qsig}
    if multiprobe_bits >= 1:
        probes |= {qsig ^ (1 << i) for i in range(n_planes)}
    if multiprobe_bits >= 2:
        probes |= {
            qsig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    return probes


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (plus buckets at
    Hamming distance ≤ multiprobe_bits), exact cosine inside."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    probes = _probe_set(query_vec, planes, multiprobe_bits)

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = embeddings.withColumn("_sig", signature_col(F.col(vec_col), planes))
    hit = bucketed.filter(F.col("_sig").isin([int(s) for s in probes]))
    return (
        hit.select(F.col(id_col).alias("id"), cosine_col(F.col(vec_col), q))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 256,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate (id_a < id_b, cosine ≥ threshold) via LSH bucket
    self-join + exact cosine verify. Oversized buckets are dropped (capped
    fan-out — log upstream if coverage accounting is needed). Pass ``dim``
    explicitly at scale (avoids the .first() probe)."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    ).withColumn("_bn", F.count(F.lit(1)).over(Window.partitionBy("sig"))).filter(
        F.col("_bn") <= max_bucket
    )
    l = b.select(F.col("sig"), F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    r = b.select(F.col("sig"), F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        l.join(r, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", cosine_col(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# materialized bucket indexes — the 100 TB probe path
# ---------------------------------------------------------------------------
# Signatures/cluster assignments are computed ONCE at build time and
# persisted into a SnapshotTable partitioned by the bucket key; a probe then
# reads ONLY the matching bucket files (manifest-level pruning — no
# signature recomputation, no full scan). This is the Iceberg
# bucket-partitioned ANN table the per-query functions above approximate.


def build_lsh_index(
    embeddings: DataFrame,
    table,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> int:
    """Materialize (id, embedding, sig) partitioned by sig. The plane seed
    and count ride in the snapshot meta so probes re-derive the exact
    hyperplanes. Pass ``dim`` explicitly at scale (avoids a .first() probe)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    df = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        signature_col(F.col(vec_col), planes).alias("sig"),
    )
    return table.commit(
        df,
        mode="replace",
        partition_by="sig",
        meta={"index": "lsh", "n_planes": n_planes, "seed": seed, "dim": dim},
    )


def lsh_topk_indexed(
    spark,
    table,
    query_vec: list[float],
    k: int = 10,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k served FROM the materialized index: the probe's
    Hamming ball is resolved to partition values and only those bucket
    files reach the scan (assert via df.inputFiles() in tests)."""
    snap = table.snapshot(table.current_snapshot_id())
    meta = snap.meta
    planes = hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    probes = _probe_set(query_vec, planes, multiprobe_bits)
    hit = table.read(spark, partition_values={str(s) for s in probes})
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        hit.select(F.col("id"), cosine_col(F.col("v"), q))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def build_ivf_index(
    embeddings: DataFrame,
    table,
    k_clusters: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Train the coarse quantizer and materialize (id, embedding, cluster)
    partitioned by cluster; centroids ride in the snapshot meta."""
    centroids = ivf_train(embeddings, k=k_clusters, iters=iters, id_col=id_col, vec_col=vec_col)
    dists = _centroid_dists(F.col(vec_col), centroids)
    df = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.array_position(dists, F.array_min(dists)).alias("cluster"),
    )
    return table.commit(
        df,
        mode="replace",
        partition_by="cluster",
        meta={"index": "ivf", "centroids": [[float(x) for x in c] for c in centroids]},
    )


def ivf_topk_indexed(
    spark,
    table,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF probe from the materialized index: only the nprobe nearest
    clusters' files reach the scan."""
    snap = table.snapshot(table.current_snapshot_id())
    centroids = np.asarray(snap.meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1), kind="stable")
    probes = {str(int(i) + 1) for i in order[:nprobe]}  # 1-based like array_position
    hit = table.read(spark, partition_values=probes)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        hit.select(F.col("id"), cosine_col(F.col("v"), qcol))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _centroid_dists(vec_col, centroids: np.ndarray):
    """Array of squared L2 distances to each centroid (JVM expressions)."""
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(vec_col, carr, lambda a, b: a.cast("double") - b)
        dists.append(F.aggregate(F.transform(diff, lambda d: d * d), F.lit(0.0), lambda acc, x: acc + x))
    return F.array(*dists)


def ivf_train(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means coarse quantizer: seed centroids are the k
    lowest-id vectors' values; fixed iteration count; centroid update is a
    per-dimension mean via posexplode + groupBy (distributed). Returns the
    (k, dim) centroid matrix (small — driver-held, broadcast as literals)."""
    seed_rows = embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = np.array([list(r[0]) for r in seed_rows], dtype=np.float64)
    for _ in range(iters):
        d = embeddings.select(
            F.col(vec_col).alias("v"),
            F.array_position(
                (dists := _centroid_dists(F.col(vec_col), centroids)), F.array_min(dists)
            ).alias("cluster"),
        )
        agg = (
            d.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in agg:
            new[int(r.cluster) - 1][int(r.pos)] = r.m
        centroids = new
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest coarse cells, exact cosine inside. At scale
    the cluster assignment is precomputed + the table is bucketed by it, so
    a probe scans only matching buckets (partition pruning)."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1), kind="stable")
    probes = [int(i) + 1 for i in order[:nprobe]]  # 1-based (array_position)
    dists = _centroid_dists(F.col(vec_col), centroids)
    assigned = embeddings.withColumn(
        "_cluster", F.array_position(dists, F.array_min(dists))
    )
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("_cluster").isin(probes))
        .select(F.col(id_col).alias("id"), cosine_col(F.col(vec_col), qcol))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
