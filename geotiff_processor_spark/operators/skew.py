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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_counts(df: DataFrame, key_col: str, n_salts: int = 16,
                  weight_col: str | None = None) -> DataFrame:
    """groupBy(key) count/sum with a salt pre-aggregation.

    Salt = a cheap deterministic spreader (hash of a high-cardinality
    sibling column mod n_salts) so the pre-aggregation is reproducible.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[c for c in df.columns
                                     if c != key_col][:1]),
                        F.lit(n_salts)))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("_w"))
    partial = salted.groupBy(key_col, "_salt").agg(*aggs)
    final_aggs = [F.sum("_n").alias("n_rows")]
    if weight_col is not None:
        final_aggs.append(F.sum("_w").alias(f"sum_{weight_col}"))
    return partial.groupBy(key_col).agg(*final_aggs)
