"""As-of join: enrich each probe row with the most recent build-side
state at-or-before its event time, per key.

The crawl/telemetry staple Spark lacks as a built-in: join every page
fetch to the robots-policy snapshot in force when it was fetched, every
click to the latest profile update, every tile request to the newest
published pyramid level. The reference's first-wins registro rule
(process.py registro dedup) is the degenerate whole-table case; this is
the keyed, time-ordered generalization.

Scale shape — ONE shuffle, NO join operator:
    union(tagged build, tagged probe)
      -> single hash-partition by key + in-partition sort by (ts, tag)
      -> running ``last(value, ignorenulls=True)`` window
      -> filter back to probe rows.
A sort-merge join with an inequality would degrade to a range
cross-product per key; the union+window form carries one running scalar
of state per key through a single Exchange, so it survives any number
of probe rows per key. Per-key work is the in-partition sort — at
100 TB, keys hash-spread across executors and no key's window state
exceeds a handful of columns. (A single pathological key serializes its
OWN sort, nothing else; salting cannot apply because as-of state is
inherently ordered per key.)

Tie rule: a build row AT the probe timestamp matches (as-of is
inclusive, ``build.ts <= probe.ts``) — the union tag sorts build rows
before probe rows at equal ``ts``. Duplicate build rows at the same
(key, ts) must be pre-deduplicated by the caller (the query layer keeps
``max(value)``), otherwise which one wins is partition-order dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(probe: DataFrame, build: DataFrame,
              key_cols: list[str], ts_col: str,
              value_cols: list[str],
              tolerance_s: int | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``probe`` row, plus ``prefix + ts_col``
    and ``prefix + c`` for each build ``value_cols`` column, taken from
    the build row with the greatest ``ts_col`` <= the probe's.

    No build row at-or-before the probe time -> NULL enrichments (left
    semantics). ``tolerance_s`` bounds staleness: a match older than
    the probe time by more than ``tolerance_s`` seconds is nulled out
    (the running state still advances past it — tolerance filters the
    OUTPUT, it does not resurrect an older match).
    """
    for c in key_cols + [ts_col]:
        if c not in probe.columns or c not in build.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    for c in value_cols:
        if c not in build.columns:
            raise ValueError(f"value column {c!r} not in build side")
    clash = [c for c in probe.columns
             if c.startswith(prefix)] + [prefix + ts_col]
    if any(prefix + c in probe.columns for c in value_cols + [ts_col]):
        raise ValueError(f"probe already has {prefix}* columns: {clash}")

    # the whole carried build row rides as ONE struct: the running
    # last(ignorenulls) must distinguish "no build row yet" (NULL
    # struct) from "a build row whose VALUE is NULL" (non-null struct,
    # null field) — per-column running lasts would skip genuinely-NULL
    # values and stitch asof_ts and asof_<value> from different rows
    carry = [ts_col] + value_cols
    state = F.struct(*[F.col(c).alias(c) for c in carry])
    null_state = F.when(F.lit(False), F.struct(
        *[F.lit(None).cast(build.schema[c].dataType).alias(c)
          for c in carry]))
    b = build.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_asof_tag"),
        state.alias("_asof_state"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in key_cols + [ts_col]],
    )
    p = probe.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_asof_tag"),
        null_state.alias("_asof_state"),
        *[F.col(c) for c in probe.columns
          if c not in key_cols + [ts_col]],
    )

    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(ts_col).asc(), F.col("_asof_tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = b.unionByName(p).withColumn(
        "_asof_state", F.last("_asof_state", ignorenulls=True).over(w))
    for c in carry:
        run = run.withColumn(prefix + c, F.col(f"_asof_state.{c}"))

    out = (run.filter(F.col("_asof_tag") == 1)
           .drop("_asof_tag", "_asof_state"))
    if tolerance_s is not None:
        # one select: every enrichment is nulled against the ORIGINAL
        # asof_ts (sequential withColumns would null asof_ts first and
        # turn the predicate NULL for the remaining columns)
        stale: Column = (
            F.col(ts_col).cast("long")
            - F.col(prefix + ts_col).cast("long")) > int(tolerance_s)
        out = out.select(
            *probe.columns,
            *[F.when(stale, F.lit(None)).otherwise(F.col(prefix + c))
              .alias(prefix + c) for c in carry])
    return out.select(*probe.columns,
                      *[prefix + c for c in carry])
