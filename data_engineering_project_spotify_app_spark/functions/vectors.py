"""Vector math: built-in HOF forms (default) + Arrow/numpy alternative.

The engine's vector operators use the JVM-side higher-order-function dot
product (similarity.dot) — zero Python in the loop. This module adds the
vectorized Pandas-UDF alternative for workloads where batched numpy wins
(very high dimensions, where per-element codegen loses to BLAS): same
semantics, Arrow-batched, never row-at-a-time. Equivalence is pinned by
tests/test_ivf.py::test_pandas_udf_cosine_matches_hof.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine similarity over two array columns (Arrow path).

    Each batch arrives as Series of lists; stacking to a 2-D ndarray
    turns the whole batch into three BLAS calls.
    """
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


def cosine_hof(a: Column, b: Column) -> Column:
    """JVM-side cosine (the default path): zip_with/aggregate dot, no UDF."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))
