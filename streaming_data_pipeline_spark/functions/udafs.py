"""Custom vectorized aggregates (grouped-agg pandas UDFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the GROUPED_AGG eval type from the real
``pd.Series -> float`` signature, and postponed evaluation would
stringify the hints and break that inference.

Scale contract (differs from built-in aggregates): each group is
materialized as one Arrow batch on an executor, so a single group must
fit in executor memory. Fine for low-cardinality keys (event types);
for high-cardinality or heavy groups prefer the built-in
percentile_approx / approx quantile paths.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DoubleType() object, not the "double" DDL string: the string form
# parses via the ACTIVE SparkSession at decoration (= import) time, so
# the module was unimportable in a session-less process — a determinism
# hazard for the evidence fingerprints and any offline tooling.
@pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact median of the group's values (numpy even-count midpoint).

    NULLs are skipped, matching SQL aggregate semantics (MEDIAN /
    percentile_approx): Arrow delivers SQL NULL as NaN, and a bare
    np.median would propagate it over the whole group. An all-NULL
    group returns NULL."""
    x = v.dropna().to_numpy()
    if x.size == 0:
        return None
    return float(np.median(x))


@pandas_udf(DoubleType())
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation — robust spread, no built-in analog.
    NULL-skipping as in :func:`median_udaf`."""
    x = v.dropna().to_numpy()
    if x.size == 0:
        return None
    m = np.median(x)
    return float(np.median(np.abs(x - m)))
