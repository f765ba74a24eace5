"""Relational operator-inventory gate queries (SURVEY.md §2) over the
driver's TPC-H-ish tables, each paired with DuckDB oracle SQL.

Every query is the Spark-first re-expression of a reference operator
(file:line cited per query). Cross-engine float discipline as in gate.py:
money sums as per-row-rounded bigint cents; per-row float expressions only
(IEEE-deterministic); trig results rounded to 6 decimals (libm ulp slack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from . import ensure_worker_imports

    ensure_worker_imports(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A-family: aggregation pipeline (reference A3/A7 import stats,
#     src/addr_reader.rs:33-65; pricing-summary style) ---------------------


def q_agg_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("l_orderkey").alias("n_orders"),
        )
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


# --- A1: arg-min dedup (street dedup keep-min-id,
#     /root/reference/src/osm_reader/street.rs:202-246) --------------------


def q_argmin_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


SQL_ARGMIN_DEDUP = """
SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --- J5: top-1-per-key as-of join (reverse-geocode top-1,
#     /root/reference/libs/mimir/src/rubber.rs:513-547) --------------------


def q_top1_per_key(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


SQL_TOP1_PER_KEY = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


# --- J2/J3: hierarchy denormalization via broadcast joins
#     (parent-chain denorm, /root/reference/src/bin/cosmogony2mimir.rs:127-145;
#      admin attach J1 — small dims are broadcast, never shuffled) ---------


def q_hierarchy_denorm(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.concat(F.col("c_name"), F.lit(" ("), F.col("n_name"), F.lit(")")).alias("label"),
        )
    )


SQL_HIERARCHY_DENORM = """
SELECT c_custkey, n_name AS nation, r_name AS region,
       c_name || ' (' || n_name || ')' AS label
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


# --- F7-as-semi-join + anti-join (coverage filter / relation-member
#     suppression, query.rs:98-113 and street.rs:154-175) ------------------


def q_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


# --- J7: multi-dataset union-merge (stop merge across datasets,
#     /root/reference/src/stops.rs:162-226) --------------------------------


def q_union_merge(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    cents = F.round(F.col("acctbal") * 100, 0).cast("long")
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_parties"),
            F.count_distinct("kind").alias("n_kinds"),
            F.sum(cents).alias("acctbal_cents"),
        )
    )


SQL_UNION_MERGE = """
WITH parties AS (
  SELECT CAST(c_nationkey AS INT) AS nationkey, 'customer' AS kind, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT CAST(s_nationkey AS INT) AS nationkey, 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
)
SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_parties,
       CAST(COUNT(DISTINCT kind) AS BIGINT) AS n_kinds,
       CAST(SUM(CAST(ROUND(acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM parties GROUP BY 1
"""


# --- A4/G11: max-normalized weights (weight normalization into [0,1],
#     /root/reference/src/utils.rs:58-72, src/stops.rs:44-58) --------------


def q_weight_normalize(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    mx = F.max("c_acctbal").over(w)
    return c.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.when(mx > 0, F.least(F.col("c_acctbal") / mx, F.lit(1.0))).otherwise(F.lit(0.0)).alias("weight"),
    )


SQL_WEIGHT_NORMALIZE = """
SELECT c_custkey, CAST(c_nationkey AS INT) AS nationkey,
       CASE WHEN MAX(c_acctbal) OVER (PARTITION BY c_nationkey) > 0
            THEN LEAST(c_acctbal / MAX(c_acctbal) OVER (PARTITION BY c_nationkey), 1.0)
            ELSE 0.0 END AS weight
FROM customer
"""


# --- §2.5 window: running aggregate over ordered partitions ---------------


def q_window_running(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w).alias("running_cents"),
    )


SQL_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
FROM orders
"""


# --- G7/G8: decay scoring (proximity decay + field_value_factor,
#     /root/reference/libs/bragi/src/query.rs:117-172; rational decay is
#     used instead of exp() for cross-engine bit-exactness) ----------------


def q_decay_score(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    # anchor past the data's max orderdate so ages stay positive (ANSI mode
    # raises on division by zero)
    age = F.date_diff(F.lit("2002-12-31").cast("date"), F.col("o_orderdate").cast("date"))
    score = F.col("o_totalprice") / (F.lit(1.0) + age.cast("double"))
    return (
        o.select("o_orderkey", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("o_orderkey"))
        .limit(50)
    )


SQL_DECAY_SCORE = """
SELECT o_orderkey,
       o_totalprice / (1.0 + CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-12-31') AS DOUBLE)) AS score
FROM orders
ORDER BY score DESC, o_orderkey ASC LIMIT 50
"""


# --- G1/G3: haversine + envelope prefilter (admin_geofinder two-phase,
#     /root/reference/src/admin_geofinder.rs:45-99; rubber.rs:171-186).
#     Coordinates synthesized deterministically from keys with modular
#     arithmetic (DuckDB has no xxhash64, so both sides derive identically).


def q_haversine_knn_v2(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.pmod(F.col("c_custkey") * 37, F.lit(1800)) / 10.0 - 90.0)
    lon = (F.pmod(F.col("c_custkey") * 91, F.lit(3600)) / 10.0 - 180.0)
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    qlat, qlon = 48.85, 2.35
    boxed = pts.filter(
        (F.col("lat") > qlat - 30) & (F.col("lat") < qlat + 30)
        & (F.col("lon") > qlon - 30) & (F.col("lon") < qlon + 30)
    )
    rad = 3.141592653589793 / 180.0
    dlat = (F.col("lat") - qlat) * rad
    dlon = (F.col("lon") - qlon) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.lit(qlat * rad)) * F.cos(F.col("lat") * rad) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    dist = F.round(2 * 6371.0 * F.asin(F.sqrt(a)), 6)
    return (
        boxed.select("c_custkey", dist.alias("dist_km"))
        .orderBy("dist_km", "c_custkey")
        .limit(20)
    )


SQL_HAVERSINE_KNN_V2 = """
WITH pts AS (
  SELECT c_custkey,
         (((c_custkey * 37) % 1800) / 10.0 - 90.0) AS lat,
         (((c_custkey * 91) % 3600) / 10.0 - 180.0) AS lon
  FROM customer
),
boxed AS (
  SELECT * FROM pts
  WHERE lat > 48.85 - 30 AND lat < 48.85 + 30 AND lon > 2.35 - 30 AND lon < 2.35 + 30
)
SELECT c_custkey,
       ROUND(2 * 6371.0 * ASIN(SQRT(
         SIN((lat - 48.85) * (3.141592653589793 / 180.0) / 2) * SIN((lat - 48.85) * (3.141592653589793 / 180.0) / 2)
         + COS(48.85 * (3.141592653589793 / 180.0)) * COS(lat * (3.141592653589793 / 180.0))
           * SIN((lon - 2.35) * (3.141592653589793 / 180.0) / 2) * SIN((lon - 2.35) * (3.141592653589793 / 180.0) / 2)
       )), 6) AS dist_km
FROM boxed
ORDER BY dist_km, c_custkey LIMIT 20
"""


# --- T-family string ops (labels/ids, /root/reference/src/labels.rs:7-19,
#     objects.rs:979-988, bano2mimir.rs:139-159) ---------------------------


def q_string_ops(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_norm"),
        F.regexp_replace(F.lower(F.col("p_name")), r"[\s/.:;]+", "-").alias("slug"),
        F.substring(F.col("p_brand"), 1, 5).alias("brand5"),
        F.regexp_replace(F.col("p_brand"), r"^Brand#", "").alias("brand_code"),
        F.concat_ws("|", F.col("p_type"), F.col("p_brand")).alias("full_label"),
    )


SQL_STRING_OPS = """
SELECT p_partkey,
       LOWER(p_name) AS name_norm,
       regexp_replace(LOWER(p_name), '[\\s/.:;]+', '-', 'g') AS slug,
       SUBSTRING(p_brand, 1, 5) AS brand5,
       regexp_replace(p_brand, '^Brand#', '') AS brand_code,
       p_type || '|' || p_brand AS full_label
FROM part
"""


# --- P7: two-pass prefix→fuzzy fallback (query.rs:667-714) ----------------

RARE_PREFIX = "zzzz-no-such-part"  # guaranteed-empty pass 1 → fallback fires
FUZZY_TOKEN = "red"


def q_two_pass_search(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    pass1 = p.filter(F.col("p_name").startswith(RARE_PREFIX))
    if pass1.limit(1).count() > 0:  # driver-side control flow, like the reference
        chosen = pass1
    else:
        chosen = p.filter(F.col("p_name").contains(FUZZY_TOKEN))
    return chosen.select("p_partkey", "p_name").orderBy("p_partkey").limit(100)


SQL_TWO_PASS_SEARCH = f"""
WITH pass1 AS (
  SELECT p_partkey, p_name FROM part WHERE p_name LIKE '{RARE_PREFIX}%'
),
pass2 AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_name LIKE '%{FUZZY_TOKEN}%'
    AND NOT EXISTS (SELECT 1 FROM pass1)
)
SELECT * FROM (SELECT * FROM pass1 UNION ALL SELECT * FROM pass2)
ORDER BY p_partkey LIMIT 100
"""


# --- F9/O1: filter + deterministic page (type filters + paging,
#     query.rs:436-459, 527-535) -------------------------------------------


def q_filter_page(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_totalprice") > 100000)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .offset(10)
        .limit(25)
    )


SQL_FILTER_PAGE = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F') AND o_totalprice > 100000
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25 OFFSET 10
"""


# --- A8-style: grouped collect + array ops (zips at max level,
#     utils.rs:37-53; merge-collections stops.rs:151-160) ------------------


def q_array_collect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_sort(F.collect_set("o_orderpriority")).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_custkey",
            F.array_join("priorities", ";").alias("priorities_joined"),
            "n_orders",
        )
    )


SQL_ARRAY_COLLECT = """
SELECT o_custkey,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ';') AS priorities_joined,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
"""


# --- G10: minimum_should_match ladder (query.rs:346-376) ------------------
# One query per ladder rung (n = 1 / 2 / 3 / 4 / 9 / 10 / 20 / 25 clauses;
# duplicate tokens are separate clauses, so the high rungs still produce
# matches against 2-token part names). Output is per-query: the clause
# count, the ladder's required-match value, and how many parts pass — so
# every rung's REQUIRED value is value-verified even when it admits no docs.

MSM_QUERIES = [
    ("q01", "red"),
    ("q02", "red widget"),
    ("q03", "red blue bolt"),
    ("q04", "red widget blue bolt"),
    ("q09", "small hot widget gear plate red blue bolt ring"),
    ("q10", "red red red red red widget widget widget widget widget"),
    ("q20", " ".join(["red"] * 10 + ["widget"] * 10)),
    ("q25", " ".join(["red"] * 13 + ["widget"] * 12)),
]


def q_fuzzy_msm(spark, sf_dir):
    from .functions.scoring import clause_overlap, msm_required

    p = _t(spark, sf_dir, "part")
    q = spark.createDataFrame(MSM_QUERIES, "qid string, qtext string").select(
        "qid", F.split("qtext", " ").alias("qt")
    )
    j = p.select(F.split("p_name", " ").alias("dt")).crossJoin(F.broadcast(q))
    scored = j.select(
        "qid",
        F.size("qt").cast("long").alias("n_tokens"),
        msm_required(F.size("qt")).alias("required"),
        clause_overlap(F.col("qt"), F.col("dt")).alias("ov"),
    )
    return scored.groupBy("qid").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.max("required").alias("required"),
        F.sum(F.when(F.col("ov") >= F.col("required"), 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
    )


_MSM_VALUES = ", ".join(f"('{qid}', '{qtext}')" for qid, qtext in MSM_QUERIES)

SQL_FUZZY_MSM = f"""
WITH q(qid, qtext) AS (VALUES {_MSM_VALUES}),
qt AS (SELECT qid, string_split(qtext, ' ') AS t FROM q),
x AS (
  SELECT qid,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CASE WHEN len(t) <= 1 THEN CAST(len(t) AS BIGINT)
              WHEN len(t) <= 3 THEN len(t) - 1
              WHEN len(t) <= 9 THEN len(t) - 2
              WHEN len(t) <= 20 THEN len(t) - 4
              ELSE CAST(floor(len(t) * 0.25) AS BIGINT) END AS required,
         CAST(len(list_filter(t, tok -> list_contains(string_split(p_name, ' '), tok))) AS BIGINT) AS ov
  FROM qt, part
)
SELECT qid, MAX(n_tokens) AS n_tokens, MAX(required) AS required,
       CAST(SUM(CASE WHEN ov >= required THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
FROM x GROUP BY qid
"""


# --- J+ as-of join (backward) over events; DuckDB ASOF JOIN oracle --------
# For each click event, the most recent prior error of the same user.


def q_asof_join(spark, sf_dir):
    from .operators.asof import asof_join_backward

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join_backward(
        clicks, errors, by=("user_id",), right_vals=("value",), prefix="err_"
    )
    return out.select(
        "click_id",
        "user_id",
        F.round("err_value", 6).alias("err_value_r"),
        F.col("err_ts"),
    )


SQL_ASOF_JOIN = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
),
e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
SELECT c.click_id, c.user_id,
       ROUND(e.value, 6) AS err_value_r, e.ts AS err_ts
FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts
"""


# --- sessionization over events (gap 30 min; lag + running-sum ids) -------


def q_sessionize(spark, sf_dir):
    from .operators.sessions import session_stats

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = session_stats(e, by=("user_id",), gap_sec=1800, tiebreak="event_id")
    return out.select(
        "user_id",
        "session_idx",
        "n_events",
        "session_start",
        "session_end",
        F.round("duration_sec", 6).alias("duration_sec_r"),
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM marked
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_sec_r
FROM sess GROUP BY 1, 2
"""


# --- A6: weight inheritance (street.rs:309-318 compute_street_weight) -----
# Suppliers ("streets") inherit the weight of their nation's "city admin"
# (max customer balance per even-keyed nation); no city admin -> own weight.


def q_weight_inherit(spark, sf_dir):
    from .operators.weights import inherit_city_weight

    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("city_key"),
        (F.col("s_acctbal").cast("double") / 1000.0).alias("weight"),
    )
    adm = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("city_key"))
        .agg(F.max(F.col("c_acctbal").cast("double")).alias("weight"))
        .withColumn("is_city", F.col("city_key") % 2 == 0)
    )
    out = inherit_city_weight(s, adm, "city_key")
    return out.select("s_suppkey", F.round("weight", 6).alias("weight_r"))


SQL_WEIGHT_INHERIT = """
WITH adm AS (
  SELECT c_nationkey AS k, MAX(CAST(c_acctbal AS DOUBLE)) AS aw
  FROM customer GROUP BY 1 HAVING k % 2 = 0
)
SELECT s_suppkey,
       ROUND(COALESCE(aw, CAST(s_acctbal AS DOUBLE) / 1000.0, 0.0), 6) AS weight_r
FROM supplier LEFT JOIN adm ON s_nationkey = k
"""


# --- A8: zips-at-max-level (utils.rs:37-53) -------------------------------
# Entity = customer; level = order year; "zips" = priorities of finished
# orders. The highest year with any finished order contributes ALL of them.


def q_zips_max_level(spark, sf_dir):
    from .operators.weights import zips_at_max_level

    o = _t(spark, sf_dir, "orders")
    rows = o.groupBy(
        F.col("o_custkey").alias("entity_id"),
        F.year("o_orderdate").alias("level"),
    ).agg(
        F.collect_list(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
        ).alias("zip_codes")
    )
    out = zips_at_max_level(rows)
    return out.select("entity_id", F.array_join("zips", ";").alias("zips_joined"))


SQL_ZIPS_MAX_LEVEL = """
WITH rows_ AS (
  SELECT o_custkey AS e, year(o_orderdate) AS lvl,
         list(o_orderpriority) FILTER (WHERE o_orderstatus = 'F') AS z
  FROM orders GROUP BY 1, 2
),
has AS (SELECT * FROM rows_ WHERE len(z) > 0),
m AS (SELECT e, MAX(lvl) AS ml FROM has GROUP BY 1)
SELECT has.e AS entity_id,
       array_to_string(list_sort(flatten(list(z))), ';') AS zips_joined
FROM has JOIN m ON has.e = m.e AND has.lvl = m.ml
GROUP BY 1
"""


def rel_queries() -> dict:
    return {
        "agg_pricing": q_agg_pricing,
        "argmin_dedup": q_argmin_dedup,
        "top1_per_key": q_top1_per_key,
        "hierarchy_denorm": q_hierarchy_denorm,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "union_merge": q_union_merge,
        "weight_normalize": q_weight_normalize,
        "window_running": q_window_running,
        "decay_score": q_decay_score,
        "haversine_knn": q_haversine_knn_v2,
        "string_ops": q_string_ops,
        "two_pass_search": q_two_pass_search,
        "filter_page": q_filter_page,
        "array_collect": q_array_collect,
        "natural_sort": q_natural_sort_v2,
        "fuzzy_msm": q_fuzzy_msm,
        "weight_inherit": q_weight_inherit,
        "zips_max_level": q_zips_max_level,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "search_scored": q_search_scored,
        "search_fuzzy": q_search_fuzzy,
    }


def rel_oracle_sql() -> dict:
    return {
        "agg_pricing": SQL_AGG_PRICING,
        "argmin_dedup": SQL_ARGMIN_DEDUP,
        "top1_per_key": SQL_TOP1_PER_KEY,
        "hierarchy_denorm": SQL_HIERARCHY_DENORM,
        "semi_join": SQL_SEMI_JOIN,
        "anti_join": SQL_ANTI_JOIN,
        "union_merge": SQL_UNION_MERGE,
        "weight_normalize": SQL_WEIGHT_NORMALIZE,
        "window_running": SQL_WINDOW_RUNNING,
        "decay_score": SQL_DECAY_SCORE,
        "haversine_knn": SQL_HAVERSINE_KNN_V2,
        "string_ops": SQL_STRING_OPS,
        "two_pass_search": SQL_TWO_PASS_SEARCH,
        "filter_page": SQL_FILTER_PAGE,
        "array_collect": SQL_ARRAY_COLLECT,
        "natural_sort": SQL_NATURAL_SORT,
        "fuzzy_msm": SQL_FUZZY_MSM,
        "weight_inherit": SQL_WEIGHT_INHERIT,
        "zips_max_level": SQL_ZIPS_MAX_LEVEL,
        "asof_join": SQL_ASOF_JOIN,
        "sessionize": SQL_SESSIONIZE,
        "search_scored": SQL_SEARCH_SCORED,
        "search_fuzzy": SQL_SEARCH_FUZZY,
    }

# --- O3: natural ("human") sort — "line 3" < "line 11"
#     (/root/reference/src/bin/ntfs2mimir.rs:78-92; sortkey = digit runs
#     zero-padded so lexicographic == natural; oracle orders numerically) ---


def q_natural_sort_v2(spark, sf_dir):
    from .functions.strings import natural_sortkey_expr

    o = _t(spark, sf_dir, "orders")
    labeled = o.select(
        "o_orderkey",
        F.concat(F.lit("line "), (F.col("o_orderkey") % 25).cast("string")).alias("label"),
    )
    w = Window.orderBy(natural_sortkey_expr("label"), F.asc("o_orderkey"))
    return labeled.withColumn("rank", F.row_number().over(w)).orderBy("rank").limit(200)


SQL_NATURAL_SORT = """
SELECT o_orderkey, 'line ' || CAST(o_orderkey % 25 AS VARCHAR) AS label,
       CAST(row_number() OVER (ORDER BY o_orderkey % 25, o_orderkey) AS BIGINT) AS rank
FROM orders
ORDER BY rank LIMIT 200
"""


# --- §2.9: the composed scored-search entry point (search.py — build_query,
#     /root/reference/libs/bragi/src/query.rs:175-462 + two-pass fallback
#     query.rs:667-714). TWO parameterizations, both NON-EMPTY at sf0.01
#     (pins chosen against the synthetic part vocabulary — 2-word names
#     drawn from {small,hot,red,blue,large,old,cold,new} × {widget,gear,
#     plate,bolt,ring,rod,gizmo,...}):
#       search_scored  pass-1 path: 2-token query that IS a label prefix
#                      ("red widget" → 24 whitelisted docs at sf0.01),
#                      doc-type whitelist, per-type boosts ×
#                      log1p(field_value_factor) importance, match-ratio
#                      should term, coverage semi-join vs lineitem,
#                      offset+limit paging on the ROUNDED score.
#       search_fuzzy   pass-2 path: 3-token query whose prefix matches
#                      nothing ("red widget purple" — 'purple' absent from
#                      the vocabulary) but whose msm ladder (n=3 →
#                      required=2) admits every red+widget doc (37 at
#                      sf0.01) — the fuzzy fallback returns a real page. --

SEARCH_QUERY = "red widget"
SEARCH_TYPES = [
    "Brand#1", "Brand#2", "Brand#10", "Brand#15",
    "Brand#16", "Brand#17", "Brand#21", "Brand#25",
]
SEARCH_TYPE_WEIGHTS = {
    "Brand#1": 2.0,
    "Brand#2": 1.5,
    "Brand#10": 1.2,
    "Brand#15": 1.0,
    "Brand#16": 0.8,
    "Brand#17": 0.6,
    "Brand#21": 0.4,
    "Brand#25": 0.2,
}
SEARCH_FUZZY_QUERY = "red widget purple"


def _msm_required_py(n: int) -> int:
    """Python mirror of functions.scoring.msm_required (the G10 ladder) —
    used only to pin the oracle SQL's required-match constant."""
    if n <= 1:
        return n
    if n <= 3:
        return n - 1
    if n <= 9:
        return n - 2
    if n <= 20:
        return n - 4
    return int(n * 0.25)


def _q_search(query: str, types, type_weights, offset: int, limit: int):
    def run(spark, sf_dir):
        from .search import SearchParams, search

        p = _t(spark, sf_dir, "part")
        li = _t(spark, sf_dir, "lineitem")
        docs = p.select(
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("label"),
            F.col("p_brand").alias("doc_type"),
            F.col("p_retailprice").alias("weight"),
        )
        params = SearchParams(
            query=query,
            types=types,
            type_weights=dict(type_weights),
            weight_factor=0.001,
            weight_missing=0.0,
            weight_modifier="log1p",
            match_boost=0.5,
            offset=offset,
            limit=limit,
        )
        return search(
            docs,
            params,
            coverage=li.select(F.col("l_partkey").alias("id")),
            coverage_on="id",
        )

    return run


def _search_sql(query: str, types, type_weights, offset: int, limit: int) -> str:
    toks = query.split()
    n = len(toks)
    required = _msm_required_py(n)
    tw_sql = " ".join(f"WHEN '{t}' THEN {w}" for t, w in type_weights.items())
    tokens_sql = ", ".join(f"'{t}'" for t in toks)
    types_sql = ", ".join("'%s'" % t for t in (types or ()))
    type_filter = f"p_brand IN ({types_sql}) AND " if types else ""
    return f"""
WITH docs AS (
  SELECT p_partkey AS id, p_name AS label, p_brand AS doc_type, p_retailprice AS weight
  FROM part
  WHERE {type_filter}p_partkey IN (SELECT l_partkey FROM lineitem)
),
scored AS (
  SELECT id, label, doc_type,
         ROUND((CASE doc_type {tw_sql} ELSE 0.0 END)
                 * ln(1 + COALESCE(weight, 0.0) * 0.001)
               + 0.5 * (CAST(len(list_filter([{tokens_sql}],
                         t -> list_contains(string_split(label, ' '), t))) AS DOUBLE) / {n}.0),
               6) AS score_r,
         CAST(len(list_filter([{tokens_sql}],
              t -> list_contains(string_split(label, ' '), t))) AS BIGINT) AS ov
  FROM docs
),
p1 AS (
  SELECT id, label, doc_type, score_r, 1 AS pass_no
  FROM scored WHERE label LIKE '{query}%'
),
p2 AS (
  SELECT id, label, doc_type, score_r, 2 AS pass_no
  FROM scored WHERE ov >= {required} AND NOT EXISTS (SELECT 1 FROM p1)
)
SELECT id, label, doc_type, score_r, pass_no
FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
ORDER BY score_r DESC, id ASC LIMIT {limit} OFFSET {offset}
"""


q_search_scored = _q_search(SEARCH_QUERY, SEARCH_TYPES, SEARCH_TYPE_WEIGHTS, 5, 10)
q_search_fuzzy = _q_search(SEARCH_FUZZY_QUERY, None, SEARCH_TYPE_WEIGHTS, 0, 25)

SQL_SEARCH_SCORED = _search_sql(SEARCH_QUERY, SEARCH_TYPES, SEARCH_TYPE_WEIGHTS, 5, 10)
SQL_SEARCH_FUZZY = _search_sql(SEARCH_FUZZY_QUERY, None, SEARCH_TYPE_WEIGHTS, 0, 25)
