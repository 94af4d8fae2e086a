"""Arrow-vectorized numeric kernels (Pandas UDFs) — the designated fast
path for vector math that JVM higher-order functions express but execute
allocation-heavily (zip_with builds an intermediate array per row; at
millions of candidate pairs that dominates).

Numerical note: numpy reduces with pairwise/SIMD summation, whose float
ordering differs from the sequential `aggregate` fold by ~1e-15 relative.
Every consumer rounds cosines to 6dp before comparison/ranking
(functions/core.py policy), so the fast path and the JVM path — and the
DuckDB oracle — stay interchangeable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def cosine_pandas(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Batched cosine similarity of two array<double> columns."""
    a = np.stack(xs.to_numpy())
    b = np.stack(ys.to_numpy())
    dots = np.einsum("ij,ij->i", a, b)
    norms = np.sqrt(np.einsum("ij,ij->i", a, a) * np.einsum("ij,ij->i", b, b))
    return pd.Series(dots / norms)
