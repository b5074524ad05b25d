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


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """Changelog between two keyed snapshots — the INVERSE of
    ``merge_upsert``: (op, key, attrs...) rows where op is 'insert'
    (key only in new), 'delete' (key only in old) or 'update' (key in
    both, any non-key column differs null-safely); unchanged rows are
    dropped. Attrs come from the NEW side for insert/update and the
    OLD side for delete — exactly what a downstream consumer applies.

    Scale shape: one full-outer sort-merge join on the key (both
    sides shuffle once — unavoidable for a diff), null-safe column
    compares inside codegen, nothing wide carried beyond the two
    snapshots' own columns. NULL keys follow MERGE semantics (never
    match): an old NULL-key row reads as delete, a new one as insert.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schemas differ: {sorted(old.columns)} vs"
            f" {sorted(new.columns)}")
    rest = [c for c in old.columns if c not in key_cols]
    # rename EVERY column on both sides: old and new often share
    # lineage (a snapshot diffed against its own merge result), and
    # same-name attribute references would be ambiguous self-join refs
    o = old.select(*[F.col(c).alias(f"_o_{c}") for c in key_cols],
                   *[F.col(c).alias(f"_o_{c}") for c in rest],
                   F.lit(True).alias("_in_old"))
    n = new.select(*[F.col(c).alias(f"_n_{c}") for c in key_cols],
                   *[F.col(c).alias(f"_n_{c}") for c in rest],
                   F.lit(True).alias("_in_new"))
    cond = None
    for c in key_cols:
        # plain equality: NULL keys never match
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in rest:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    op = (F.when(F.col("_in_old").isNull(), F.lit("insert"))
          .when(F.col("_in_new").isNull(), F.lit("delete"))
          .when(changed, F.lit("update")))
    out_key = [F.coalesce(F.col(f"_o_{c}"), F.col(f"_n_{c}")).alias(c)
               for c in key_cols]
    out_attr = [
        F.when(F.col("_in_new").isNull(), F.col(f"_o_{c}"))
        .otherwise(F.col(f"_n_{c}")).alias(c) for c in rest]
    return (j.withColumn("op", op).filter(F.col("op").isNotNull())
            .select("op", *out_key, *out_attr))


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
