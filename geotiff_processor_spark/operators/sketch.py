"""Deterministic cardinality sketch (KMV / k-minimum-values).

Distinct-count estimation (Bar-Yossef et al. 2002, public literature)
— the planning sketch a 100 TB pipeline runs BEFORE choosing partition
counts, join strategies or dedup key spaces. Unlike HLL (whose
register layout is engine-specific, so Spark's approx_count_distinct
can never hash-match another engine), KMV over an explicit md5-derived
hash is a pure function of the data: both engines compute the SAME
k minimum 60-bit hashes and the SAME estimate, so the operator is
fully oracle-checkable like everything else in this repo.

Estimator: with m = k-th smallest of the distinct keys' uniform
60-bit hashes, E[distinct] ~ (k-1) * 2^60 / m; groups holding fewer
than k distinct keys report their exact count (the standard small-
cardinality fallback).

Scale shape: ONE corpus-sized exchange — the (group, hash) distinct
partial agg (md5 computed map-side; key text never shuffles beyond
that agg's own key). The min-k selection is TWO-PHASE: a salted local
top-k bounds every window sort to ~k * distinct/(salts) rows, then a
global top-k runs over <= k * n_salts candidates per group — exactly
equal to a direct min-k (every global top-k element is in its salt
bucket's top-k), without ever sorting a whole hot group (the skew
hazard of naive per-group windows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import sql_hash60

TWO60 = float(2 ** 60)


def kmv_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str] | None = None,
                 k: int = 64, n_salts: int = 8,
                 round_to: int = 6) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns (group_cols..., n_min bigint, est_distinct double):
    n_min = number of retained minimum hashes (== k, or the exact
    distinct count when smaller), est_distinct = (k-1)*2^60/m rounded,
    or the exact count when n_min < k.
    """
    groups = list(group_cols or [])
    hashed = (df
              .select(*groups,
                      F.expr(sql_hash60(key_col)).alias("h"))
              .distinct())
    # phase 1: per (group, salt) local min-k — bounds every sort
    salt = (F.pmod(F.col("h"), F.lit(n_salts))).cast("int")
    w_local = Window.partitionBy(*groups, "salt").orderBy("h")
    local = (hashed.withColumn("salt", salt)
             .withColumn("rn", F.row_number().over(w_local))
             .filter(F.col("rn") <= k)
             .drop("rn", "salt"))
    # phase 2: global min-k over <= k * n_salts candidates per group
    w_glob = Window.partitionBy(*groups).orderBy("h")
    kept = (local.withColumn("rn", F.row_number().over(w_glob))
            .filter(F.col("rn") <= k).drop("rn"))
    agg_keys = groups if groups else [F.lit(1).alias("_g")]
    out = (kept.groupBy(*agg_keys)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_min"),
                F.max("h").alias("m")))
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(TWO60)
                / F.col("m").cast("double"), round_to))
    out = out.withColumn("est_distinct", est).drop("m")
    if not groups:
        out = out.drop("_g")
    return out


def sql_kmv_distinct(key_expr: str, table: str,
                     group_cols: list[str] | None = None,
                     k: int = 64, round_to: int = 6,
                     where: str = "") -> str:
    """The identical estimate as DuckDB SQL (single-phase min-k — the
    salted two-phase is exactly equal by construction)."""
    groups = list(group_cols or [])
    gsel = ", ".join(groups) + (", " if groups else "")
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    h = sql_hash60(key_expr, dialect="duckdb")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {gsel}{h} AS h FROM {table} {where}
), ranked AS (
  SELECT {gsel}h,
         row_number() OVER ({part} ORDER BY h) AS rn
  FROM hashed
)
SELECT {gsel}cast(count(*) as bigint) AS n_min,
       CASE WHEN count(*) < {k} THEN cast(count(*) as double)
            ELSE round({float(k - 1)} * {TWO60!r}
                       / cast(max(h) as double), {round_to})
       END AS est_distinct
FROM ranked WHERE rn <= {k} {gby}
"""


def cms_token_counts(docs: DataFrame, text_col: str = "text",
                     depth: int = 4, width: int = 16) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the token
    stream, evaluated against the exact counts:
    (token, cms_count, exact_count).

    Unlike HLL-style sketches, CMS is a PURE FUNCTION of the data given
    fixed hash functions (md5-derived row hashes here), so the whole
    build+query chain is oracle-checkable. The sketch itself is
    depth x width counters built with ONE partial-agg shuffle of
    (row, bucket) pairs — bounded size at ANY corpus scale; estimates
    are min-over-rows via a broadcast join of the tiny counter table.
    The default width is deliberately SMALL so collisions are real and
    the min-over-depth rule is genuinely exercised (cms >= exact, with
    strict overestimates present); production sizes width ~ e/eps.
    """
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")) \
        .filter(F.col("tok") != "")
    def _bucket_sql(d: int) -> str:
        h = sql_hash60(f"concat('cms', {d}, ':', tok)")
        return f"({h} % {width})"

    # round 6: aggregate to exact per-token counts FIRST (one shuffle
    # with map-side partial agg), then hash each DISTINCT token once
    # per row and weight the sketch counters by exact_count — the
    # counter values are identical (sum of per-token occurrence counts
    # per bucket == occurrence count per bucket) but the md5s drop
    # from depth x occurrences to depth x vocabulary
    exact = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("exact_count"))
    qbuckets = exact.select(
        "tok", "exact_count",
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     F.expr(_bucket_sql(d)).alias("b"))
            for d in range(depth)])).alias("p"))
    sketch = (qbuckets.groupBy("p.d", "p.b")
              .agg(F.sum("exact_count").alias("cnt")))
    est = (qbuckets.join(F.broadcast(sketch),
                         (F.col("p.d") == sketch["d"])
                         & (F.col("p.b") == sketch["b"]))
           .groupBy("tok", "exact_count")
           .agg(F.min("cnt").alias("cms_count")))
    return est.select("tok", "cms_count", "exact_count")


# ---------------------------------------------------------------------------
# HyperLogLog (explicit md5-derived registers => oracle-checkable)
# ---------------------------------------------------------------------------

HLL_M = 64            # registers (p = 6 bucket bits)
HLL_ALPHA = 0.709     # Flajolet et al. 2007 bias constant for m = 64
_HLL_VBITS = 54       # rank bits: 60-bit hash minus 6 bucket bits


def _sql_hll_rho() -> str:
    """rho(h) = leading-zero count of the high 54 hash bits, + 1.

    v = h >> 6 and v >= 2^k  <=>  h >= 2^(k+6) (h = 64 v + r, r < 64),
    so the rank is a pure threshold CASE on h itself — no division, no
    log, bit-identical in any engine. h must be a column named ``h``.
    """
    whens = "".join(
        f" WHEN h >= {1 << (_HLL_VBITS + 6 - rho)} THEN {rho}"
        for rho in range(1, _HLL_VBITS + 1))
    return f"(CASE{whens} ELSE {_HLL_VBITS + 1} END)"


def _sql_hll_estimate() -> str:
    """Estimate from (n_regs, s_present): the harmonic sum is kept as
    an EXACT INTEGER (sum of 2^(55-reg), each a bigint; empty registers
    contribute 2^55), so the only floating-point steps are one division
    and the final round — deterministic across engines. Small-range
    (linear counting) branch constants are Python-side literals, so
    both engines compare and emit the very same doubles."""
    two55 = 1 << (_HLL_VBITS + 1)
    num = repr(HLL_ALPHA * HLL_M * HLL_M * float(two55))
    s_total = f"(s_present + ({HLL_M} - n_regs) * {two55})"
    raw = f"({num} / cast({s_total} as double))"
    lin = "".join(
        f" WHEN n_regs = {HLL_M - e} THEN "
        f"{round(HLL_M * math.log(HLL_M / e), 6)!r}"
        for e in range(1, HLL_M))
    return (f"(CASE WHEN n_regs < {HLL_M} AND {raw} <= {2.5 * HLL_M!r}"
            f" THEN (CASE{lin} ELSE 0.0 END)"
            f" ELSE round({raw}, 6) END)")


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate
    (Flajolet/Fusy/Gandouet/Meunier 2007, public literature), over
    explicit md5-derived registers so — unlike Spark's built-in
    approx_count_distinct, whose register layout is engine-private —
    the WHOLE sketch is a pure function of the data and hash-matches
    the DuckDB oracle. Complements kmv_distinct: HLL registers are
    O(m) per group and MERGEABLE by max(), the shape a 100 TB pipeline
    streams; KMV keeps k raw minima.

    Returns (group_cols..., n_registers bigint, est_distinct double).

    Scale shape: ONE corpus-sized partial-agg exchange —
    groupBy(group, bucket).max(rho) — carrying only small ints (key
    text is hashed map-side and never shuffles); the per-group fold of
    64 registers is a second, register-bounded agg.
    """
    groups = list(group_cols or [])
    h = df.select(*groups, F.expr(sql_hash60(key_col)).alias("h"))
    regs = (h.withColumn("bucket", F.expr(f"h % {HLL_M}"))
            .withColumn("rho", F.expr(_sql_hll_rho()))
            .groupBy(*groups, "bucket")
            .agg(F.max("rho").alias("reg")))
    agg_keys = groups if groups else [F.lit(1).alias("_g")]
    out = (regs.groupBy(*agg_keys)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_regs"),
                F.sum(F.expr(
                    f"cast(pow(2, {_HLL_VBITS + 1} - reg) as bigint)"))
                .alias("s_present")))
    out = (out.withColumn("est_distinct", F.expr(_sql_hll_estimate()))
           .withColumn("n_registers", F.col("n_regs"))
           .drop("n_regs", "s_present"))
    if not groups:
        out = out.drop("_g")
    return out.select(*groups, "n_registers", "est_distinct")


def sql_hll_distinct(key_expr: str, table: str,
                     group_cols: list[str] | None = None,
                     where: str = "") -> str:
    """The identical estimate as DuckDB SQL (same generated rho CASE,
    same integer harmonic sum, same literal constants)."""
    groups = list(group_cols or [])
    gsel = ", ".join(groups) + (", " if groups else "")
    gby1 = "GROUP BY " + ", ".join(groups + ["bucket"])
    gby2 = ("GROUP BY " + ", ".join(groups)) if groups else ""
    h = sql_hash60(key_expr, dialect="duckdb")
    return f"""
WITH hashed AS (
  SELECT {gsel}{h} AS h FROM {table} {where}
), regs AS (
  SELECT {gsel}h % {HLL_M} AS bucket,
         max({_sql_hll_rho()}) AS reg
  FROM hashed {gby1}
), folded AS (
  SELECT {gsel}cast(count(*) as bigint) AS n_regs,
         sum(cast(pow(2, {_HLL_VBITS + 1} - reg) as bigint)) AS s_present
  FROM regs {gby2}
)
SELECT {gsel}n_regs AS n_registers,
       {_sql_hll_estimate()} AS est_distinct
FROM folded
"""
