"""User-defined aggregates (SURVEY.md §2.9 UDAF row).

The reference exposes no user UDAF surface; Spark's is the GROUPED_AGG
pandas_udf (Arrow-batched per group). NOTE: no `from __future__ import
annotations` here — pandas_udf resolves the real type hints.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def geometric_mean():
    """Geometric-mean grouped aggregate: exp(mean(ln x)) over positive
    values, NULL for empty groups."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        x = v.dropna()
        x = x[x > 0]
        if x.empty:
            return None
        return float(np.exp(np.log(x).mean()))

    return geo_mean
