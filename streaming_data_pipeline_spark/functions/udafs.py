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


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median of the group's values (numpy even-count midpoint)."""
    return float(np.median(v.to_numpy()))


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation — robust spread, no built-in analog."""
    x = v.to_numpy()
    return float(np.median(np.abs(x - np.median(x))))
