"""Slowly-changing-dimension (SCD type 2) history build: turn a stream
of keyed updates into effective-dated version rows — the warehouse-side
twin of the as-of join (asof.py CONSUMES the state this op MATERIALIZES).

``scd2_history``: (key, ts, attrs...) updates -> one row per retained
version with [valid_from, valid_to) and an is_current flag. Consecutive
updates with identical tracked attributes collapse into one version
(the run-length squash real CDC feeds need — most updates don't change
the tracked columns).

Scale shape: ONE shuffle (hash by key), everything after is per-key
window work over that single partitioning — change-detection lag(),
version close lead(), both on the same (key, ts) sort, so Catalyst
reuses one Exchange + one Sort. No joins, no state beyond the window
frame. Reference analog: the registro first-wins rule
(process.py registro dedup) keeps only the first version; SCD2 keeps
them all with validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(updates: DataFrame, key_cols: list[str], ts_col: str,
                 attr_cols: list[str]) -> DataFrame:
    """One row per version: key, attrs, valid_from, valid_to (NULL =
    open), is_current. Duplicate-timestamp updates per key are invalid
    input (which version wins would be nondeterministic) — callers
    pre-dedup; this function keeps the row with the greatest attr
    tuple deterministically.
    """
    for c in key_cols + [ts_col] + attr_cols:
        if c not in updates.columns:
            raise ValueError(f"column {c!r} not in {updates.columns}")

    # deterministic tie squash: one row per (key, ts). A row_number
    # window, NOT a groupBy — hashpartitioning(key) satisfies the
    # (key, ts) window's clustering requirement, so the dedup rides
    # the SAME single exchange every later window needs (a groupBy
    # (key, ts) would add a second full shuffle of the update feed).
    w_tie = Window.partitionBy(*key_cols, ts_col).orderBy(
        *[F.col(c).desc() for c in attr_cols])
    one = (updates.repartition(*key_cols)
           .withColumn("_rn", F.row_number().over(w_tie))
           .filter(F.col("_rn") == 1).drop("_rn"))

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        changed = changed | ~(prev.eqNullSafe(F.col(c)))
    # first row per key: lag(ts) is NULL -> always a new version
    starts = one.withColumn(
        "_new_version",
        F.lag(ts_col).over(w).isNull() | changed,
    ).filter(F.col("_new_version")).drop("_new_version")

    # close each version at the NEXT version's start (same partitioning)
    return starts.select(
        *key_cols, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
