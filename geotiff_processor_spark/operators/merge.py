"""MERGE INTO (upsert): apply a change set to a keyed snapshot —
matched keys take the source row, unmatched target rows survive,
source-only keys insert. The warehouse primitive behind Iceberg/Delta
``MERGE``; this container has no Iceberg runtime (BASELINE.json note,
carried since round 1), so the engine exposes the same semantics as a
deterministic DataFrame plan whose output feeds the dynamic-partition-
overwrite sinks (sources/sinks.py).

Scale shape: ONE shuffle. Tag both sides, union, keep the
highest-priority row per key with a row_number window — no join at
all, so there is no build-side materialization and skewed keys cost
only their own sort. (A full-outer join formulation shuffles BOTH
sides too, but then pays coalesce-per-column and NULL-key edge cases;
the union form is also how the SCD2 squash works, one mechanism to
audit.) At 100 TB the write side pairs this with partition overwrite:
only partitions containing changed keys rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """Upserted snapshot: same schema as ``target``; ``source`` must
    share it. Duplicate keys WITHIN source are invalid input (which
    update wins is undefined in SQL MERGE too) — the deterministic
    policy here keeps the lexicographically greatest non-key tuple."""
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schemas differ: {sorted(target.columns)} vs"
            f" {sorted(source.columns)}")
    for c in key_cols:
        if c not in target.columns:
            raise ValueError(f"key {c!r} not in columns")
    rest = [c for c in target.columns if c not in key_cols]
    s = source.select(*target.columns).withColumn("_pri", F.lit(0))
    t = target.withColumn("_pri", F.lit(1))
    unioned = s.unionByName(t)
    # SQL MERGE's ON t.k = s.k never matches a NULL key: NULL-key rows
    # on either side pass through untouched (target survives, source
    # inserts) instead of being grouped into one NULL partition
    null_key = F.lit(False)
    for c in key_cols:
        null_key = null_key | F.col(c).isNull()
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_pri").asc(), *[F.col(c).desc() for c in rest])
    merged = (unioned.filter(~null_key)
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))
    return merged.unionByName(unioned.filter(null_key)).drop("_pri")
