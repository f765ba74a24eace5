"""Direct tests of the composed scored-search entry point (search.py) —
the reference's most-used read path (build_query /root/reference/libs/
bragi/src/query.rs:175-462; two-pass fallback query.rs:667-714; golden
behavior tests/bragi_three_cities_test.rs:88-111).

Covers: prefix hit (pass 1), fuzzy fallback on empty pass 1 (pass 2, msm
ladder), deterministic paging, coverage semi-join, type whitelist + extra
predicate, single_pass ≡ two_action equivalence, and the single-pass
plan's zero-action construction."""

import math

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimirsbrunn_spark.search import SearchParams, search

DOCS = [
    # (id, label, doc_type, weight)
    (1, "paris", "city", 5000.0),
    (2, "paris ridge", "street", 120.0),
    (3, "paris ridge lane", "street", 90.0),
    (4, "south paris", "city", 800.0),
    (5, "ridge lane", "street", 40.0),
    (6, "melun", "city", 300.0),
    (7, "paris", "poi", 10.0),
    (8, "lane of paris ridge", "poi", 60.0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "id long, label string, doc_type string, weight double"
    )


def _params(query, **kw):
    base = dict(
        type_weights={"city": 2.0, "street": 1.0, "poi": 0.5},
        weight_factor=0.001,
        weight_modifier="log1p",
        match_boost=0.5,
        offset=0,
        limit=10,
    )
    base.update(kw)
    return SearchParams(query=query, **base)


def _expected_score(doc, query, type_weights, n):
    tw = type_weights.get(doc[2], 0.0)
    importance = tw * math.log1p(doc[3] * 0.001)
    ov = sum(1 for t in query.split() if t in doc[1].split())
    return round(importance + 0.5 * ov / n, 6)


@pytest.mark.parametrize("mode", ["single_pass", "two_action"])
def test_prefix_hit_pass1(docs, mode):
    """A query that prefixes some labels returns ONLY those labels, marked
    pass 1, scored and ordered (score desc, id asc)."""
    out = search(docs, _params("paris ridge"), mode=mode).collect()
    assert [r["id"] for r in out] == [2, 3]
    assert all(r["pass_no"] == 1 for r in out)
    tw = {"city": 2.0, "street": 1.0, "poi": 0.5}
    for r in out:
        doc = next(d for d in DOCS if d[0] == r["id"])
        assert r["score_r"] == pytest.approx(
            _expected_score(doc, "paris ridge", tw, 2), abs=1e-9
        )


@pytest.mark.parametrize("mode", ["single_pass", "two_action"])
def test_fuzzy_fallback_pass2(docs, mode):
    """No label starts with the query → pass 2 admits docs passing the msm
    ladder (3 tokens → required 2)."""
    out = search(docs, _params("ridge paris zzz"), mode=mode).collect()
    # docs containing ≥2 of {ridge, paris, zzz}: ids 2, 3, 8
    assert sorted(r["id"] for r in out) == [2, 3, 8]
    assert all(r["pass_no"] == 2 for r in out)


@pytest.mark.parametrize("mode", ["single_pass", "two_action"])
def test_paging_deterministic(docs, mode):
    """offset/limit slice one global (score desc, id asc) order; pages are
    stable across runs and tile the full result."""
    p_all = _params("paris", limit=None, offset=0)
    full = [r["id"] for r in search(docs, p_all, mode=mode).collect()]
    pages = []
    for off in range(0, len(full), 2):
        page = search(docs, _params("paris", offset=off, limit=2), mode=mode)
        pages.extend(r["id"] for r in page.collect())
    assert pages == full
    again = [r["id"] for r in search(docs, p_all, mode=mode).collect()]
    assert again == full


def test_score_ties_break_on_id(spark):
    """Equal rounded scores page by id asc — the cross-engine-stable order."""
    docs = spark.createDataFrame(
        [(i, "paris", "city", 100.0) for i in (9, 3, 7, 1)],
        "id long, label string, doc_type string, weight double",
    )
    out = search(docs, _params("paris")).collect()
    assert [r["id"] for r in out] == [1, 3, 7, 9]


def test_coverage_semi_join(docs, spark):
    """coverage restricts results to ids present in it (F7)."""
    cov = spark.createDataFrame([(2,), (3,), (6,)], "id long")
    out = search(docs, _params("paris ridge"), coverage=cov, coverage_on="id")
    assert sorted(r["id"] for r in out.collect()) == [2, 3]
    # coverage can also empty pass 1 entirely → fallback engages THROUGH the
    # semi-join (the filters apply to both passes, as in the reference's
    # single bool query)
    cov2 = spark.createDataFrame([(8,)], "id long")
    out2 = search(docs, _params("paris ridge"), coverage=cov2, coverage_on="id").collect()
    assert [r["id"] for r in out2] == [8]
    assert out2[0]["pass_no"] == 2


def test_type_whitelist_and_predicate(docs):
    """F9 type whitelist + the arbitrary extra predicate hook (F10)."""
    out = search(docs, _params("paris", types=["city"])).collect()
    assert sorted(r["id"] for r in out) == [1]  # only label-prefix 'paris' cities
    out2 = search(docs, _params("paris"), predicate=F.col("weight") < 100.0).collect()
    assert sorted(r["id"] for r in out2) == [3, 7]


def test_modes_equivalent(docs, spark):
    """single_pass and two_action produce identical pages on both the
    prefix-hit and the fuzzy-fallback path, with and without coverage."""
    cov = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    for q in ("paris", "paris ridge", "ridge paris zzz", "no such tokens here"):
        for kw in ({}, {"coverage": cov, "coverage_on": "id"}):
            a = search(docs, _params(q), mode="single_pass", **kw).collect()
            b = search(docs, _params(q), mode="two_action", **kw).collect()
            assert [tuple(r) for r in a] == [tuple(r) for r in b], q


def test_single_pass_constructs_without_action(docs, monkeypatch):
    """Constructing the default-mode search DataFrame must trigger NO Spark
    action — the pass-1/pass-2 decision rides inside the plan. (two_action
    runs its probe count at construction time, by design.)"""

    def _boom(self):  # pragma: no cover - triggers only on regression
        raise AssertionError("driver-side action during single_pass construction")

    # patch the CONCRETE class — pyspark.sql.DataFrame is the abstract
    # parent in Spark 4 and the classic implementation overrides both
    cls = type(docs)
    monkeypatch.setattr(cls, "count", _boom)
    monkeypatch.setattr(cls, "collect", _boom)
    # sanity: the patch actually intercepts (two_action's probe must trip it)
    with pytest.raises(AssertionError, match="driver-side action"):
        search(docs, _params("paris ridge"), mode="two_action")
    df = search(docs, _params("paris ridge"), mode="single_pass")
    monkeypatch.undo()
    assert [r["id"] for r in df.collect()] == [2, 3]


def test_single_pass_plan_broadcasts_flag(docs):
    """The any-pass-1 flag joins back via a broadcast, not a shuffle."""
    plan = search(docs, _params("paris ridge"))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_empty_result(docs):
    out = search(docs, _params("qqq www eee rrr ttt yyy uuu iii ooo ppp"))
    assert out.count() == 0


def test_empty_query_rejected(docs):
    """An empty/whitespace query must raise — not divide the match ratio by
    zero and page the whole corpus with null scores."""
    for q in ("", "   "):
        with pytest.raises(ValueError, match="at least one token"):
            search(docs, _params(q))


def test_paged_search_plan_is_topk_not_global_sort(docs):
    """A paged search (offset+limit) must plan as TakeOrderedAndProject —
    distributed top-k with the offset folded in — never a global Sort of
    all candidates (the 100 TB difference between 'each partition keeps 55
    rows' and 'shuffle-sort the corpus'). The pass-1/pass-2 disjunction
    must also reach the scan as a pushed Filter."""
    df = search(docs, _params("paris ridge", offset=5, limit=50))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "offset=5" in plan
    # no full-result global sort node (TakeOrderedAndProject replaces it)
    assert "\n+- Sort " not in plan and " Sort [" not in plan
    # candidate pruning happens scan-side: a Filter with the prefix
    # predicate sits under the scoring Project
    assert "Filter (StartsWith" in plan or "Filter ((StartsWith" in plan
