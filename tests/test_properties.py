"""Property-based invariants (hypothesis) — SURVEY.md §5.4.

Operator algebra the engine must preserve for ANY input, checked on
hypothesis-generated id multisets: dedup-enrich cardinality, set-op
laws, union-distinct idempotence, sessionize partitioning.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_ids = st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=60)

_SETTINGS = {"max_examples": 12, "deadline": None, "derandomize": True}


def _df(spark, xs, col="id"):
    return spark.createDataFrame([(int(x),) for x in xs], f"{col} bigint")


@given(ids=_ids)
@settings(**_SETTINGS)
def test_dedup_enrich_cardinality(spark, ids):
    """q_batch_enrich law (O1): |distinct(ids) ⋈ entity| == |distinct ids
    present in entity| — enrichment never duplicates or drops keys
    (app.py:164→167–177)."""
    entity = _df(spark, range(0, 51, 2))  # even keys exist
    got = _df(spark, ids).distinct().join(entity, "id", "inner").count()
    want = len({x for x in ids if x % 2 == 0})
    assert got == want


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_union_distinct_idempotent_and_commutative(spark, a, b):
    """U2: distinct(a ∪ b) == distinct(b ∪ a) == distinct(a ∪ b ∪ a)."""
    da, db = _df(spark, a), _df(spark, b)
    ab = set(r["id"] for r in da.unionByName(db).distinct().collect())
    ba = set(r["id"] for r in db.unionByName(da).distinct().collect())
    aba = set(
        r["id"]
        for r in da.unionByName(db).unionByName(da).distinct().collect()
    )
    assert ab == ba == aba == set(a) | set(b)


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_semi_anti_partition_the_left(spark, a, b):
    """J3/J4: semi(a,b) ⊎ anti(a,b) == a (multiset) — membership routing
    loses nothing (app.py:205–208)."""
    da, db = _df(spark, a), _df(spark, b)
    semi = da.join(db, "id", "left_semi").count()
    anti = da.join(db, "id", "left_anti").count()
    assert semi + anti == len(a)


@given(a=_ids, b=_ids)
@settings(**_SETTINGS)
def test_except_intersect_laws(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    ex = {r["id"] for r in da.subtract(db).collect()}
    inter = {r["id"] for r in da.intersect(db).collect()}
    assert ex == set(a) - set(b)
    assert inter == set(a) & set(b)
    assert ex | inter == set(a)


@given(xs=st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_topk_matches_python_sort(spark, xs):
    """L-layer: Spark orderBy+limit == Python sorted()[:k] under the same
    deterministic tie-break."""
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "rid bigint, v bigint"
    )
    got = [
        (r["rid"], r["v"])
        for r in df.orderBy(F.col("v").desc(), "rid").limit(5).collect()
    ]
    want = sorted(enumerate(xs), key=lambda t: (-t[1], t[0]))[:5]
    assert got == [(i, v) for i, v in want]
