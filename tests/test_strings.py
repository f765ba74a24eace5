"""functions/strings.py — analyzer/label family unit tests (the reference's
in-module label/id tests, /root/reference/src/labels.rs:189-365,
objects.rs:990-1000, re-expressed)."""

from pyspark.sql import functions as F

from mimirsbrunn_spark.functions import strings as S


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_fold_and_normalize(spark):
    df = spark.createDataFrame([("Hôtel-de-Ville ÉLYSÉE œuvre",)], "s string")
    got = df.select(S.normalize_word(F.col("s")).alias("v")).collect()[0].v
    assert got == "hotel-de-ville elysee ouvre"
    uni = df.select(S.fold_unicode_udf()(F.col("s")).alias("v")).collect()[0].v
    assert uni == "Hotel-de-Ville ELYSEE œuvre"  # NFKD strips combining marks


def test_elision_and_synonyms(spark):
    df = spark.createDataFrame([(["l'hotel", "bd", "d'or", "rue"],)], "t array<string>")
    stripped = df.select(F.transform("t", lambda x: S.strip_elision(x)).alias("v")).collect()[0].v
    assert stripped == ["hotel", "bd", "or", "rue"]
    syn = df.select(S.expand_synonyms(F.col("t")).alias("v")).collect()[0].v
    assert syn == ["l'hotel", "boulevard", "d'or", "rue"]


def test_ngrams(spark):
    df = spark.createDataFrame([("paris",)], "s string")
    edge = df.select(S.edge_ngrams_expr("s", 1, 3).alias("v")).collect()[0].v
    assert edge == ["p", "pa", "par"]
    ng = df.select(S.ngrams_expr("s", 3).alias("v")).collect()[0].v
    assert ng == ["par", "ari", "ris"]


def test_i18n_label_fallback(spark):
    df = spark.createDataFrame(
        [({"fr": "Paris", "de": "Paris (DE)"}, "de", "Paris-default"),
         ({"fr": "Paris"}, "zh", "Paris-default")],
        "labels map<string,string>, lang string, dflt string",
    )
    got = [r.v for r in df.select(S.i18n_label(F.col("labels"), F.col("lang"), F.col("dflt")).alias("v")).collect()]
    assert got == ["Paris (DE)", "Paris-default"]


def test_label_format_and_ids(spark):
    df = spark.createDataFrame([("Rue du Four", "Livry", "07512", " 3 b/4.5 ", 2.351234567, 48.85)],
                               "name string, city string, insee string, hn string, lon double, lat double")
    r = df.select(
        S.format_label(F.col("name"), F.col("city")).alias("label"),
        S.format_label(F.col("name"), F.lit(None).cast("string")).alias("label_nocity"),
        S.insee_prefix(F.col("insee")).alias("insee"),
        S.sanitize_id(F.col("hn")).alias("hn"),
        S.coord_id(F.col("lon"), F.col("lat")).alias("cid"),
        S.snake_case(F.lit("SuburbMunicipality")).alias("snake"),
    ).collect()[0]
    assert r.label == "Rue du Four (Livry)"
    assert r.label_nocity == "Rue du Four"
    assert r.insee == "7512"
    assert r.hn == "3b-4-5"
    assert r.cid == "2.351235;48.850000"
    assert r.snake == "suburb_municipality"


def test_zip_split_join(spark):
    df = spark.createDataFrame([("75001;75002;75003",)], "z string")
    r = df.select(S.join_zips(S.split_zips(F.col("z"))).alias("v")).collect()[0].v
    assert r == "75001;75002;75003"


def test_natural_sortkey(spark):
    df = spark.createDataFrame([("line 3",), ("line 11",), ("Line 2",)], "s string")
    got = [
        r.s
        for r in df.orderBy(S.natural_sortkey_expr("s")).collect()
    ]
    assert got == ["Line 2", "line 3", "line 11"]


def test_multiword_synonyms(spark):
    """Multi-word keys ('gare sncf'→'gare') and multi-word replacements
    ('cc'→'centre commercial') must both work, with token counts consistent
    (regression: token-level map could never match a spaced key)."""
    from mimirsbrunn_spark.functions.strings import synonym_tokens

    df = spark.createDataFrame(
        [
            ("gare sncf de lyon",),
            ("cc des halles",),
            ("bd saint germain",),
            ("la gare sncf",),
        ],
        "s string",
    )
    got = [r.t for r in df.select(synonym_tokens(F.col("s")).alias("t")).collect()]
    assert got[0] == ["gare", "de", "lyon"]
    assert got[1] == ["centre", "commercial", "des", "halles"]
    assert got[2] == ["boulevard", "saint", "germain"]
    assert got[3] == ["la", "gare"]


def test_canonicalize_url(spark):
    from mimirsbrunn_spark.functions.urls import canonicalize_url

    cases = [
        ("HTTP://WWW.Example.COM:80/A/B?b=2&a=1#x", "http://www.example.com/A/B?a=1&b=2"),
        ("https://e.com:443/p?utm_source=x&gclid=1", "https://e.com/p"),
        ("https://e.com:8443/p?z=1&utm_x=2", "https://e.com:8443/p?z=1"),  # non-default port kept
        ("http://e.com/", "http://e.com/"),
        ("https://e.com/p?ref=abc&a=1&fbclid=z", "https://e.com/p?a=1"),
        ("https://e.com/p?utm_campaign=y", "https://e.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_multiword_synonyms_regex_metachars(spark):
    """ADVICE r2 (low): user-supplied synonym keys/values with regex
    metacharacters must be treated literally (\\Q..\\E quoting; $ and \\
    escaped in the replacement)."""
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.functions.strings import apply_multiword_synonyms

    syn = {"c++ lang": "cpp", "a.b c": "x$y", "q (r)": "s\\t"}
    df = spark.createDataFrame(
        [("the c++ lang rocks",), ("azb c is not a.b c",), ("q (r) here",)], "s string"
    )
    got = [
        r.v
        for r in df.select(apply_multiword_synonyms(F.col("s"), syn).alias("v")).collect()
    ]
    assert got[0] == "the cpp rocks"
    # '.' must not match 'z'; the real 'a.b c' is replaced with a literal $
    assert got[1] == "azb c is not x$y"
    assert got[2] == "s\\t here"
