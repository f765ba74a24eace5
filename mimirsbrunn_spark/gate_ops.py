"""Training-data operator gate queries over the driver's ``documents`` and
``embeddings`` tables, paired with DuckDB oracle SQL where expressible.

Non-SQL-expressible ops (minhash LSH pipeline, simhash, LSH ANN) are exposed
as rows-only entries (no oracle) — their exactness is covered by pytest
oracles in tests/test_operators.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup, similarity, text


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from . import ensure_worker_imports

    ensure_worker_imports(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- token counting -------------------------------------------------------


def q_doc_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))


SQL_DOC_TOKENS = r"""
SELECT doc_id,
       CASE WHEN TRIM(LOWER(text)) = '' THEN 0
            ELSE CAST(len(string_split_regex(TRIM(LOWER(text)), '\s+')) AS BIGINT)
       END AS n_tokens
FROM documents
"""


# --- quality scoring ------------------------------------------------------


def q_doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        text.punct_ratio(c).alias("punct_ratio"),
        text.stopword_ratio(c).alias("stopword_ratio"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in text.STOPWORDS)

SQL_DOC_QUALITY = rf"""
WITH toks AS (
  SELECT doc_id, text,
         CASE WHEN TRIM(LOWER(text)) = '' THEN []
              ELSE string_split_regex(TRIM(LOWER(text)), '\s+') END AS t
  FROM documents
)
SELECT doc_id,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS punct_ratio,
       CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
         / GREATEST(len(t), 1) AS stopword_ratio
FROM toks
"""


# --- exact dedup groups ---------------------------------------------------


def q_doc_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(dedup.normalized(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


SQL_DOC_DEDUP_EXACT = r"""
SELECT md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


# --- rolling fingerprints (document-fragment identity) --------------------


def q_doc_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(text.rolling_fingerprints("text", 16)).alias("fp")
    )


SQL_DOC_FINGERPRINTS = """
SELECT doc_id,
       UNNEST(list_transform(
         generate_series(0, GREATEST((GREATEST(length(text) - 16, 0)) // 8, 0)),
         i -> md5(substring(text, i * 8 + 1, 16)))) AS fp
FROM documents
"""


# --- language ID (marker-word heuristic; SQL generated from the same
#     marker table as the Spark expression — no drift) ---------------------


def q_doc_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text.lang_id(F.col("text")).alias("lang_pred"))


def _langid_sql() -> str:
    score_cols = []
    for lang, markers in text.LANG_MARKERS.items():
        marker_list = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter(t, x -> x IN ({marker_list}))) AS s_{lang}"
        )
    langs = list(text.LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = "'unknown'"
    for lang in reversed(langs):
        case = f"CASE WHEN s_{lang} = best AND best > 0 THEN '{lang}' ELSE {case} END"
    return rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN TRIM(LOWER(text)) = '' THEN []
              ELSE string_split_regex(TRIM(LOWER(text)), '\s+') END AS t
  FROM documents
),
scored AS (
  SELECT doc_id, {', '.join(score_cols)} FROM toks
),
ranked AS (
  SELECT doc_id, {best} AS best, * FROM scored
)
SELECT doc_id, {case} AS lang_pred FROM ranked
"""


# --- ANN: brute-force cosine top-k (exact baseline) -----------------------


def q_ann_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    out = similarity.brute_force_topk(e, qvec, k=10)
    return out.select("id", F.round("cosine", 6).alias("cosine_r"))


SQL_ANN_BRUTEFORCE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id,
         list_inner_product(
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(q.qv, x -> CAST(x AS DOUBLE)))
         / (sqrt(list_inner_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                    list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
            * sqrt(list_inner_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),
                                      list_transform(q.qv, x -> CAST(x AS DOUBLE))))) AS cosine
  FROM embeddings e, q
)
SELECT id, ROUND(cosine, 6) AS cosine_r
FROM scored ORDER BY cosine DESC, id ASC LIMIT 10
"""


# --- rows-only entries (exactness covered by pytest oracles) --------------


def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(d, threshold=0.5, k=32, bands=16)


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d)


def q_ann_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    return similarity.lsh_topk(e, qvec, k=10, multiprobe_bits=2).select(
        "id", F.round("cosine", 6).alias("cosine_r")
    )


def q_embedding_near_dups(spark, sf_dir):
    """Near-dup detection demo with planted duplicates: the table unioned
    with an id-shifted copy of itself → every (i, i+10000) pair is an exact
    duplicate (cosine 1.0) and must be found. At threshold 0.95 only those
    qualify (max off-pair cosine in this data ≈ 0.51), so the LSH bucket
    filter is exercised while the result is brute-force-oracle-checkable."""
    e = _t(spark, sf_dir, "embeddings")
    u = e.select("vec_id", "embedding").unionByName(
        e.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    return similarity.embedding_near_dup_pairs(u, threshold=0.95).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine_r")
    )


SQL_EMBEDDING_NEAR_DUPS = """
WITH u AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE)) FROM embeddings
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         list_inner_product(a.v, b.v)
           / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cosine
  FROM u a, u b WHERE a.id < b.id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine_r FROM pairs WHERE cosine >= 0.95
"""


def ops_queries() -> dict:
    return {
        "doc_tokens": q_doc_tokens,
        "doc_quality": q_doc_quality,
        "doc_dedup_exact": q_doc_dedup_exact,
        "doc_fingerprints": q_doc_fingerprints,
        "doc_langid": q_doc_langid,
        "ann_bruteforce": q_ann_bruteforce,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "ann_lsh": q_ann_lsh,
        "embedding_near_dups": q_embedding_near_dups,
    }


def ops_oracle_sql() -> dict:
    return {
        "doc_tokens": SQL_DOC_TOKENS,
        "doc_quality": SQL_DOC_QUALITY,
        "doc_dedup_exact": SQL_DOC_DEDUP_EXACT,
        "doc_fingerprints": SQL_DOC_FINGERPRINTS,
        "doc_langid": _langid_sql(),
        "ann_bruteforce": SQL_ANN_BRUTEFORCE,
        "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
        # minhash_pairs / simhash / ann_lsh: rows-only (pytest oracles)
    }
