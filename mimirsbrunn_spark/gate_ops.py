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
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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


# --- minhash / simhash / ann_lsh (value-verified gate variants) -----------
#
# The production operators hash with xxhash64 (JVM intrinsic); DuckDB has no
# xxhash64, so the GATE variants pin the md5_60 hash (md5 hex-prefix as a
# 60-bit int — bit-identical across engines, see operators/dedup.py) so the
# driver can verify VALUES, not just row counts. Same pipeline, same shapes;
# only the hash family differs.

_DUCK_H60 = "(('0x' || substr(md5(%s), 1, 15))::BIGINT)"
_NORM_TOKS = r"string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')), ' ')"


def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        d, threshold=0.5, k=32, bands=16, hasher="md5_60"
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def _minhash_sql(k: int = 32, bands: int = 16, shingle_n: int = 3, max_bucket: int = 64,
                 threshold: float = 0.5) -> str:
    rows_per_band = k // bands
    lanes = ", ".join(
        "list_min(list_transform(s, x -> "
        + _DUCK_H60 % f"'mh{i}:' || x"
        + "))"
        for i in range(k)
    )
    band_branches = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"CAST(g[{b * rows_per_band + r + 1}] AS VARCHAR)" for r in range(rows_per_band)
        )
        band_branches.append(
            f"SELECT doc_id, {b} AS band, {_DUCK_H60 % concat} AS bucket FROM sig"
        )
    banded = "\n  UNION ALL ".join(band_branches)
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_NORM_TOKS} AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, GREATEST(len(t) - {shingle_n - 1}, 1)),
    i -> array_to_string(list_slice(t, i, i + {shingle_n - 1}), ' '))) AS s
  FROM toks
),
sig AS MATERIALIZED (
  SELECT doc_id, [{lanes}] AS g FROM sh
),
banded AS MATERIALIZED (
  {banded}
),
sized AS (
  SELECT doc_id, band, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM banded)
  WHERE bn <= {max_bucket}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b USING (band, bucket)
  WHERE a.doc_id < b.doc_id
),
j AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.s, sb.s))
           / GREATEST(len(list_distinct(list_concat(sa.s, sb.s))), 1) AS jaccard
  FROM pairs
  JOIN sh sa ON sa.doc_id = id_a
  JOIN sh sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard_r FROM j WHERE jaccard >= {threshold}
"""


def _dedup_clusters_sql(threshold: float = 0.5, **kw) -> str:
    """Value-verified oracle for the ITERATIVE connected-components dedup
    clustering: the same minhash-pair CTEs (md5_60 gate hash) feed a
    recursive transitive-closure CTE; component = min reachable id. DuckDB
    recursion replaces Spark's min-label-propagation loop — identical
    fixpoint."""
    base = _minhash_sql(threshold=threshold, **kw)
    # reuse everything up to (and incl.) the j CTE; swap the final select
    head = base[: base.rindex("SELECT id_a, id_b, ROUND")].rstrip()
    head = head.replace("WITH toks", "WITH RECURSIVE toks", 1)
    return (
        head
        + f""",
fp AS (SELECT id_a, id_b FROM j WHERE jaccard >= {threshold}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM fp UNION SELECT id_b, id_a FROM fp
),
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
)
SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY 1
"""
    )


def q_dedup_clusters(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.dedup_clusters(d, threshold=0.5, k=32, bands=16, hasher="md5_60")


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d, hasher="md5_60")


def _simhash_sql(n_bits: int = 60) -> str:
    terms = " + ".join(
        f"CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> {b}) & 1)) > len(hs)"
        f" THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(n_bits)
    )
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id AS id,
         list_transform({_NORM_TOKS}, t -> {_DUCK_H60 % 't'}) AS hs
  FROM documents
)
SELECT id, CAST({terms} AS BIGINT) AS simhash FROM toks
"""


def q_ann_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    return similarity.lsh_topk(e, qvec, k=10, multiprobe_bits=2).select(
        "id", F.round("cosine", 6).alias("cosine_r")
    )


def _ann_lsh_sql(dim: int = 64, n_planes: int = 12, multiprobe_bits: int = 2, k: int = 10) -> str:
    """Same deterministic hyperplanes as similarity.hyperplanes (seeded numpy)
    as SQL literals; the Hamming-ball probe set (multiprobe ≤ 2 bit flips)
    becomes bit_count(xor(sig, qsig)) <= 2."""
    planes = similarity.hyperplanes(dim, n_planes)
    sig_terms = " + ".join(
        "CASE WHEN list_inner_product(v, ["
        + ", ".join(repr(float(x)) for x in p)
        + f"]) > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END"
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS MATERIALIZED (
  SELECT id, v, ({sig_terms}) AS sig FROM e
),
q AS (SELECT v AS qv, sig AS qs FROM sigs WHERE id = 0),
hit AS (
  SELECT s.id, s.v FROM sigs s, q WHERE bit_count(xor(s.sig, q.qs)) <= {multiprobe_bits}
),
scored AS (
  SELECT id,
         list_inner_product(v, qv)
           / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) AS cosine
  FROM hit, q
)
SELECT id, ROUND(cosine, 6) AS cosine_r FROM scored ORDER BY cosine DESC, id ASC LIMIT {k}
"""


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


# --- URL canonicalization (pre-dedup identity for crawl URLs) --------------


def q_url_canon(spark, sf_dir):
    from .functions.urls import canonicalize_url

    d = _t(spark, sf_dir, "documents")
    # deterministic messy URLs synthesized from table columns: mixed-case
    # scheme/host, default ports, tracking params, unsorted params, fragments
    url = F.concat(
        F.lit("HTTPS://Example-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?z=2&utm_source=x&a=1&gclid=abc&b="),
                (F.col("doc_id") % 5).cast("string"),
            ),
        ).otherwise(F.lit("?utm_campaign=y")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    d = d.select("doc_id", url.alias("url"))
    return d.select("doc_id", "url", canonicalize_url(F.col("url")).alias("canon"))


SQL_URL_CANON = r"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://Example-' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
         || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
         || '/p/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0
                 THEN '?z=2&utm_source=x&a=1&gclid=abc&b=' || CAST(doc_id % 5 AS VARCHAR)
                 ELSE '?utm_campaign=y' END
         || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         LOWER(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         LOWER(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS auth,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM raw
),
cleaned AS (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http' AND auth LIKE '%:80'
                THEN substring(auth, 1, length(auth) - 3)
              WHEN scheme = 'https' AND auth LIKE '%:443'
                THEN substring(auth, 1, length(auth) - 4)
              ELSE auth END AS auth,
         path,
         COALESCE(array_to_string(list_sort(list_filter(string_split(query, '&'),
           p -> p <> ''
                AND NOT list_contains(['gclid','fbclid','msclkid','ref'],
                                      string_split(p, '=')[1])
                AND NOT starts_with(string_split(p, '=')[1], 'utm_'))), '&'), '') AS q
  FROM parts
)
SELECT doc_id, url,
       scheme || '://' || auth || path
       || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon
FROM cleaned
"""


# --- Gopher-style quality rule bundle --------------------------------------


def q_gopher_rules(spark, sf_dir):
    from .operators.text import (
        alpha_word_ratio,
        gopher_quality,
        mean_word_length,
        repetition_ratio,
        symbol_word_ratio,
    )

    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.round(mean_word_length(c), 6).alias("mean_word_len_r"),
        F.round(repetition_ratio(c), 6).alias("repetition_r"),
        F.round(symbol_word_ratio(c), 6).alias("symbol_r"),
        F.round(alpha_word_ratio(c), 6).alias("alpha_r"),
        gopher_quality(c, min_words=20).alias("passes"),
    )


SQL_GOPHER_RULES = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, text, toks,
         list_transform(generate_series(1, GREATEST(len(toks) - 1, 1)),
                        i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS grams
  FROM t
),
m AS (
  SELECT doc_id,
         CASE WHEN TRIM(text) = '' THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) END AS mwl,
         CASE WHEN len(toks) >= 2
              THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
              ELSE 0.0 END AS rep,
         (length(text) - length(regexp_replace(text, '[#…]', '', 'g'))) * 1.0
           / GREATEST(len(toks), 1) AS sym,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 1.0
           / GREATEST(len(toks), 1) AS alpha,
         CASE WHEN TRIM(LOWER(text)) = '' THEN 0 ELSE len(toks) END AS n
  FROM g
)
SELECT doc_id,
       ROUND(mwl, 6) AS mean_word_len_r,
       ROUND(rep, 6) AS repetition_r,
       ROUND(sym, 6) AS symbol_r,
       ROUND(alpha, 6) AS alpha_r,
       (n >= 20 AND n <= 100000 AND mwl <= 10.0 AND sym <= 0.1
        AND alpha >= 0.8 AND rep <= 0.3) AS passes
FROM m
"""


# --- ANN: IVF probe with pinned coarse centroids ---------------------------
# The production quantizer is k-means (ivf_train — iterative, driver-held
# centroids); the GATE pins the quantizer to "the k lowest-id vectors" so
# BOTH engines derive identical centroids from the data itself and the
# whole probe (assign → nprobe nearest cells → exact cosine) is
# value-verified. Tie-breaks pinned: lowest centroid id wins (Spark's
# array_position-of-min = first minimum).


def q_ann_ivf(spark, sf_dir):
    from .operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    import numpy as np

    seed_rows = e.filter(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    centroids = np.array([[float(x) for x in r[0]] for r in seed_rows], dtype=np.float64)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = ivf_topk(e, qvec, centroids, k=10, nprobe=3)
    return out.select("id", F.round("cosine", 6).alias("cosine_r"))


SQL_ANN_IVF = """
WITH e AS MATERIALIZED (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
q AS (SELECT v AS qv FROM e WHERE id = 0),
dists AS (
  SELECT e.id, e.v, c.cid,
         list_inner_product(list_transform(list_zip(e.v, c.cv), t -> t[1] - t[2]),
                            list_transform(list_zip(e.v, c.cv), t -> t[1] - t[2])) AS d2
  FROM e, c
),
assign AS (
  SELECT id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM dists)
  WHERE rn = 1
),
qd AS (
  SELECT c.cid,
         list_inner_product(list_transform(list_zip(q.qv, c.cv), t -> t[1] - t[2]),
                            list_transform(list_zip(q.qv, c.cv), t -> t[1] - t[2])) AS d2
  FROM c, q
),
probes AS (
  SELECT cid FROM (SELECT cid, row_number() OVER (ORDER BY d2, cid) AS rn FROM qd)
  WHERE rn <= 3
),
hit AS (SELECT a.id, a.v FROM assign a JOIN probes p ON a.cid = p.cid),
scored AS (
  SELECT id,
         list_inner_product(v, qv)
           / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) AS cosine
  FROM hit, q
)
SELECT id, ROUND(cosine, 6) AS cosine_r FROM scored ORDER BY cosine DESC, id ASC LIMIT 10
"""


# --- boilerplate detection: per-host frequent segments ---------------------
# A deterministic per-source footer is injected in-query so the gate always
# has known boilerplate to find; natural segments that cross the threshold
# match identically in both engines.


def q_boilerplate(spark, sf_dir):
    from .operators.text import boilerplate_segments

    d = _t(spark, sf_dir, "documents")
    d2 = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(". visit our site "),
            F.col("source"),
            F.lit(" for more. all rights reserved"),
        ).alias("text"),
    )
    out = boilerplate_segments(d2, host_col="source", min_ratio=0.5, min_host_docs=2)
    return out.select(
        "host", "seg_norm", "n_docs", "host_docs", F.round("ratio", 6).alias("ratio_r")
    )


SQL_BOILERPLATE = """
WITH d AS (
  SELECT doc_id, source,
         text || '. visit our site ' || source || ' for more. all rights reserved' AS text
  FROM documents
),
hd AS (SELECT source AS host, COUNT(DISTINCT doc_id) AS host_docs FROM d GROUP BY 1),
seg0 AS (
  SELECT source AS host, doc_id AS id, unnest(string_split(text, '. ')) AS seg FROM d
),
seg AS (
  SELECT DISTINCT host, id, TRIM(LOWER(seg)) AS seg_norm
  FROM seg0 WHERE TRIM(LOWER(seg)) <> ''
),
freq AS (SELECT host, seg_norm, COUNT(*) AS n_docs FROM seg GROUP BY 1, 2)
SELECT f.host, seg_norm, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(host_docs AS BIGINT) AS host_docs,
       ROUND(n_docs * 1.0 / host_docs, 6) AS ratio_r
FROM freq f JOIN hd ON f.host = hd.host
WHERE host_docs >= 2 AND n_docs * 1.0 / host_docs >= 0.5
"""


# --- mergeable size-distribution sketch + derived percentiles --------------


def q_size_histogram(spark, sf_dir):
    from .operators.histograms import size_histogram

    d = _t(spark, sf_dir, "documents")
    return size_histogram(d, value_col="n_chars", keys=("lang",))


SQL_SIZE_HISTOGRAM = """
SELECT lang,
       CAST(LEAST(length(bin(COALESCE(GREATEST(n_chars, 0), 0) + 1)) - 1, 40) AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


def q_size_quantiles(spark, sf_dir):
    from .operators.histograms import histogram_quantile, size_histogram

    d = _t(spark, sf_dir, "documents")
    h = size_histogram(d, value_col="n_chars", keys=("lang",))
    p50 = histogram_quantile(h, 0.5, keys=("lang",), out_col="p50_ub")
    p95 = histogram_quantile(h, 0.95, keys=("lang",), out_col="p95_ub")
    return p50.join(p95, "lang")


SQL_SIZE_QUANTILES = """
WITH h AS (
  SELECT lang,
         CAST(LEAST(length(bin(COALESCE(GREATEST(n_chars, 0), 0) + 1)) - 1, 40) AS INT) AS bin,
         COUNT(*) AS n
  FROM documents GROUP BY 1, 2
),
c AS (
  SELECT lang, bin,
         SUM(n) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (PARTITION BY lang) AS total
  FROM h
),
pick AS (
  SELECT lang,
         MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bin END) AS b50,
         MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN bin END) AS b95
  FROM c GROUP BY 1
)
SELECT lang,
       CAST(POW(2.0, b50 + 1) - 2 AS BIGINT) AS p50_ub,
       CAST(POW(2.0, b95 + 1) - 2 AS BIGINT) AS p95_ub
FROM pick
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (operators/text.scrub_pii): emails, IPv4s and
    phone numbers replaced by placeholders, with per-kind pre-scrub counts.
    The documents fixture carries no PII, so deterministic PII is
    synthesized from doc_id IN the query (same string math in the oracle)
    and the scrub must remove all of it — a non-trivial value check of the
    whole regexp chain. Pure regexp_replace/regexp_count columns (codegen)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    salted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1 555 010 "),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" end"),
    )
    return docs.select(
        "doc_id",
        text.scrub_pii(salted).alias("clean_text"),
        *text.pii_counts(salted),
    )


def _pii_scrub_sql() -> str:
    scrubbed, counts = text.scrub_pii_sql("s")
    return f"""
WITH lim AS (SELECT * FROM documents WHERE doc_id < 500),
salted AS (
  SELECT doc_id,
         COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.7 or +1 555 010 ' || CAST(doc_id % 100 AS VARCHAR) || ' end' AS s
  FROM lim)
SELECT doc_id, {scrubbed} AS clean_text, {', '.join(counts)}
FROM salted
"""



# --- benchmark decontamination (13-gram overlap) --------------------------


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 13-gram contamination stats vs a deterministic eval
    subset (doc_id % 97 = 0 — the gate's stand-in for an eval corpus;
    eval members match themselves 100%, short docs carry total_grams=0).
    Gate variant joins on the gram STRING (hasher='none') so the DuckDB
    twin is exactly equal; production uses xxhash64 keys + broadcast
    (operators/decontam.py)."""
    from .operators import decontam

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return decontam.contamination(docs, ev, n=13, hasher="none")


SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+12], ' ')
                        for i in range(1, greatest(len(t) - 11, 1))]) AS gs
  FROM toks
), dg AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
), eval_g AS (
  SELECT DISTINCT g FROM dg WHERE doc_id % 97 = 0
), per AS (
  SELECT dg.doc_id, count(*) AS total,
         sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS matched
  FROM dg LEFT JOIN eval_g e USING (g) GROUP BY dg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.total, 0) AS BIGINT) AS total_grams,
       CAST(COALESCE(per.matched, 0) AS BIGINT) AS matched_grams,
       CAST(COALESCE(per.matched, 0) AS DOUBLE)
         / CAST(greatest(COALESCE(per.total, 0), 1) AS DOUBLE) AS contam_frac
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


# --- real BPE token counting (rows-only gate) ------------------------------


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merges-table-driven BPE token count per document (operators/bpe.py,
    fixed GATE_MERGES table). Arrow-batched pandas UDF — not expressible in
    DuckDB SQL, so this is a rows-only driver entry; exactness vs an
    independent pure-python reference is pinned in tests/test_bpe.py."""
    from .operators import bpe

    docs = _t(spark, sf_dir, "documents")
    return bpe.with_bpe_tokens(docs, bpe.GATE_MERGES).select(
        "doc_id", "bpe_tokens"
    )


# --- deterministic stratified sampling -------------------------------------

_SAMPLE_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.75}
_SAMPLE_SEED = 42


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded hash-based per-lang sampling (operators/sampling.py): keep a
    doc iff md5_60(doc_id ':seed') % 1e6 < rate_lang * 1e6 — exactly
    reproducible in DuckDB, so the gate pins the precise kept set, not
    just counts."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [(k, v) for k, v in _SAMPLE_RATES.items()], "lang string, rate double"
    )
    out = sampling.stratified_sample(
        docs, rates, strata=("lang",), key_col="doc_id",
        seed=_SAMPLE_SEED, hasher="md5_60",
    )
    return out.select("doc_id", "lang", "source")


def _stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v * 1_000_000)}" for k, v in _SAMPLE_RATES.items()
    )
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SAMPLE_SEED}'), 1, 15))::BIGINT)
      % 1000000
      < (CASE lang {cases} ELSE 0 END)
"""


# --- duplicate-passage detection (operators/passages.py) -------------------


def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span stats: strided 20-token windows
    (stride 10), a span is dup iff its gram occurs >=2 times corpus-wide
    (cross-doc OR internal repetition). Gate variant keys on the gram
    STRING (hasher='none') so the DuckDB twin is exactly equal; production
    uses xxhash64 keys (operators/passages.py)."""
    from .operators import passages

    docs = _t(spark, sf_dir, "documents")
    return passages.duplicate_passages(docs, n=20, stride=10, hasher="none")


SQL_DUP_PASSAGES = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS t
  FROM documents
), spans AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+19], ' ')
                 for i in range(1, greatest(len(t) - 18, 1), 10)]) AS g
  FROM toks
), dup AS (
  SELECT g FROM spans GROUP BY g HAVING count(*) >= 2
), per AS (
  SELECT s.doc_id, count(*) AS total,
         sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END) AS dup_n
  FROM spans s LEFT JOIN dup d USING (g) GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.total, 0) AS BIGINT) AS total_spans,
       CAST(COALESCE(per.dup_n, 0) AS BIGINT) AS dup_spans,
       CAST(COALESCE(per.dup_n, 0) AS DOUBLE)
         / CAST(greatest(COALESCE(per.total, 0), 1) AS DOUBLE) AS dup_frac
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


# --- TF-IDF keyword extraction (operators/keywords.py) ---------------------


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document. The top-k pick is integer-
    lexicographic (tf DESC, df ASC, term ASC) so the selected set is
    engine-independent; the float score is output-only, rounded to 6."""
    from .operators import keywords

    docs = _t(spark, sf_dir, "documents")
    out = keywords.tfidf_topk(docs, k=5)
    return out.withColumnRenamed("rank", "rnk")


SQL_TFIDF_TOPK = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS t
  FROM documents
), tt AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY 1, 2
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         round(CAST(tf.tf AS DOUBLE)
               * ln((SELECT n FROM n) / CAST(dfq.df AS DOUBLE)), 6) AS score_r,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
              ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS BIGINT) AS rnk
  FROM tf JOIN dfq USING (term)
)
SELECT doc_id, term, tf, df, score_r, rnk FROM ranked WHERE rnk <= 5
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
        "dedup_clusters": q_dedup_clusters,
        "size_histogram": q_size_histogram,
        "size_quantiles": q_size_quantiles,
        "url_canon": q_url_canon,
        "boilerplate": q_boilerplate,
        "ann_ivf": q_ann_ivf,
        "gopher_rules": q_gopher_rules,
        "simhash": q_simhash,
        "ann_lsh": q_ann_lsh,
        "embedding_near_dups": q_embedding_near_dups,
        "pii_scrub": q_pii_scrub,
        "decontaminate": q_decontaminate,
        "stratified_sample": q_stratified_sample,
        "bpe_tokens": q_bpe_tokens,
        "dup_passages": q_dup_passages,
        "tfidf_topk": q_tfidf_topk,
        "pps_sample": q_pps_sample,
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
        "minhash_pairs": _minhash_sql(),
        "dedup_clusters": _dedup_clusters_sql(),
        "size_histogram": SQL_SIZE_HISTOGRAM,
        "size_quantiles": SQL_SIZE_QUANTILES,
        "url_canon": SQL_URL_CANON,
        "boilerplate": SQL_BOILERPLATE,
        "ann_ivf": SQL_ANN_IVF,
        "gopher_rules": SQL_GOPHER_RULES,
        "simhash": _simhash_sql(),
        "ann_lsh": _ann_lsh_sql(),
        "pii_scrub": _pii_scrub_sql(),
        "decontaminate": SQL_DECONTAMINATE,
        "stratified_sample": _stratified_sample_sql(),
        "dup_passages": SQL_DUP_PASSAGES,
        "tfidf_topk": SQL_TFIDF_TOPK,
        "pps_sample": SQL_PPS_SAMPLE,
    }


# --- PPS systematic sampling (operators/sampling.py) ------------------------


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sample: 25 picks per
    lang, proportional to text byte length, rows shuffled by the seeded
    md5_60 bucket — ALL integer arithmetic (running sums + integer DIV),
    so the exact pick set and multiplicities reproduce in DuckDB."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents")
    w = docs.withColumn("w", F.octet_length("text").cast("long"))
    out = sampling.pps_systematic_sample(
        w, "w", 25, strata=("lang",), key_col="doc_id",
        seed=_SAMPLE_SEED, hasher="md5_60",
    )
    return out.select("doc_id", "lang", "w", "n_picks")


SQL_PPS_SAMPLE = f"""
WITH base AS (
  SELECT doc_id, lang, CAST(strlen(text) AS BIGINT) AS w,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SAMPLE_SEED}'),
           1, 15))::BIGINT) % 1000000 AS b
  FROM documents WHERE strlen(text) > 0
),
cum AS (
  SELECT doc_id, lang, w,
         SUM(w) OVER (PARTITION BY lang ORDER BY b, CAST(doc_id AS VARCHAR)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(w) OVER (PARTITION BY lang) AS tot
  FROM base
)
SELECT doc_id, lang, w,
       CAST((c * 25) // tot - ((c - w) * 25) // tot AS BIGINT) AS n_picks
FROM cum
WHERE (c * 25) // tot - ((c - w) * 25) // tot >= 1
"""
