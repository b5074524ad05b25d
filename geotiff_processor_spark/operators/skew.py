"""Skew handling: salted two-phase aggregation (north_rule: hot H3/S2
cells from dense urban areas).

The synthetic layout concentrates ~5% of pages into 3 city cells — at a
12-level cell granularity those keys are orders of magnitude hotter than
the uniform background. A single groupBy(cell) shuffles every hot-cell
row to one reducer; the salted form first aggregates (cell, salt) —
spreading each hot key over ``n_salts`` reducers — then combines the
partials. Results are identical (tested + oracle-checked); only the
shuffle distribution changes.

Joins don't need this here: the PIP polygon side broadcasts, so no join
key ever shuffles. For shuffling joins the session enables AQE skew-join
splitting (session.py).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def salted_counts(df: DataFrame, key_col: str, spread_col: str,
                  n_salts: int = 16,
                  weight_col: str | None = None) -> DataFrame:
    """groupBy(key) count/sum with a salt pre-aggregation.

    Salt = a cheap deterministic spreader: hash of ``spread_col`` (an
    EXPLICIT high-cardinality sibling column, e.g. ``url``) mod
    ``n_salts``, so the pre-aggregation is reproducible. The spreader
    is a required argument because a silently-picked low-cardinality
    column (e.g. ``lang``) would spread each hot key over at most
    |distinct values| reducers, defeating the salting.
    """
    if spread_col == key_col:
        raise ValueError(
            "spread_col must differ from key_col: hashing the group key "
            "yields ONE salt per key and spreads nothing")
    if spread_col not in df.columns:
        raise ValueError(f"spread_col {spread_col!r} not in {df.columns}")
    dtype = df.schema[spread_col].dataType
    if isinstance(dtype, T.BooleanType):
        warnings.warn(
            f"spread_col {spread_col!r} is boolean (cardinality <= 2): "
            f"hot keys will spread over at most 2 of {n_salts} salts",
            stacklevel=2)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(spread_col), F.lit(n_salts)))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("_w"))
    partial = salted.groupBy(key_col, "_salt").agg(*aggs)
    final_aggs = [F.sum("_n").alias("n_rows")]
    if weight_col is not None:
        final_aggs.append(F.sum("_w").alias(f"sum_{weight_col}"))
    return partial.groupBy(key_col).agg(*final_aggs)
