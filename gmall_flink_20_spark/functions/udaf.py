"""Grouped-aggregate Pandas UDAFs (SURVEY §2.12: the reference's inline
``AggregateFunction`` classes are the moral UDAF surface; Spark's
equivalent is ``pandas_udf`` GROUPED_AGG).

Factories (not module-level decorators) because ``pandas_udf`` resolves
its return-type DDL against the active session at construction time.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

__all__ = ["weighted_mean", "p_quantile"]


@lru_cache(maxsize=None)
def _weighted_mean_udf():
    @pandas_udf("double")
    def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
        w = weights.to_numpy(dtype=np.float64)
        v = values.to_numpy(dtype=np.float64)
        tot = w.sum()
        return float((v * w).sum() / tot) if tot else float("nan")

    return weighted_mean


@lru_cache(maxsize=None)
def _p_quantile_udf():
    @pandas_udf("double")
    def p_quantile(values: pd.Series) -> float:
        return float(values.quantile(0.5))

    return p_quantile


def weighted_mean(values, weights):
    """Weight-averaged value per group (Arrow-batched numpy reduction)."""
    return _weighted_mean_udf()(values, weights)


def p_quantile(values):
    """Exact in-group median (the built-in approx_percentile's exact
    counterpart for moderate group sizes)."""
    return _p_quantile_udf()(values)
