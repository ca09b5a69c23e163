"""Pandas GROUPED_AGG UDAFs — the custom-aggregation surface
(SURVEY.md §2.10) for state the built-in aggregates can't carry.

Rule of the house: expressions first (the registered KMV queries are
pure window/agg expressions, exactly oracle-checked), a UDAF only when
an operator needs a MERGEABLE opaque state object as a column value —
e.g. shipping per-partition sketches to a coordinator, or persisting a
sketch column next to the data it summarizes. ``kmv_sketch_udaf``
implements that contract for the KMV distinct sketch: the aggregate
VALUE is the k-min hash array, which merges associatively
(sort-union-truncate), so sketches of shards can be re-aggregated
without touching raw rows — the same algebra the streaming twin
(kmv_sketch_stream) maintains incrementally.

Equivalence with the expression-based q_kmv_distinct is pinned in
tests/test_udaf.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

KMV_UDAF_K = 256


def kmv_sketch_udaf(k: int = KMV_UDAF_K) -> Column:
    """GROUPED_AGG pandas UDAF: the k smallest DISTINCT hash values of
    the ``hv`` column per group, as a sorted array<long> — a mergeable
    KMV sketch. Arrow ships each group's column as one numpy-backed
    Series; np.unique sorts and dedups in C.

    Estimate from the returned sketch (same closed form as
    q_kmv_distinct): m < k -> exact m, else (k-1) * 2^32 / kth.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _kmv(hv: pd.Series) -> list:
        vals = np.unique(hv.to_numpy(dtype=np.int64))
        return vals[:k].tolist()

    return _kmv(F.col("hv"))


def kmv_merge_arrays(a: Column, b: Column, k: int = KMV_UDAF_K) -> Column:
    """Merge two KMV sketch arrays losslessly: sorted distinct union,
    truncated to k — pure built-ins (array_union keeps distinct), so
    the merge itself never leaves codegen."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_estimate(sketch: Column, k: int = KMV_UDAF_K) -> Column:
    """Distinct-count estimate from a KMV sketch array."""
    m = F.size(sketch)
    kth = F.element_at(sketch, -1)
    return F.when(m < k, m.cast("double")).otherwise(
        F.lit((k - 1) * 4294967296.0) / kth
    )
