"""Corpus-assembly operators: the stages between a cleaned document set
and training-ready shards.

Beyond the reference's raster scope (it has no text surface), these are
the export-side steps a 100 TB pretraining pipeline runs after
filtering/dedup (textprep.py) and before tokenized output:

- ``shuffle_rank``: deterministic global training-order shuffle.
  Hash-derived shard + within-shard position — the standard
  distributed substitute for a true global permutation: one hash
  partition shuffle and a per-shard local sort, never a global sort or
  a driver-side permutation. Reproducible across runs and engines (no
  ``rand()``; md5 of a seeded key).
- ``pack_sequences``: greedy concat-and-split sequence packing.
  Documents are laid out in shuffle order and the token stream is cut
  every ``budget`` tokens; each doc gets the sequence id and offset
  where it STARTS (long docs span sequences — inherent to
  concat-split packing). Window cumsum per shard: the ROWS-framed
  running sum reuses the shard partitioning, so packing adds no
  shuffle beyond the shuffle_rank one.
- ``source_cap``: per-source document quota (crawl balancing — no
  single domain/source may contribute more than ``cap`` docs). The
  kept set is the ``cap`` lowest-hash docs per source, so membership
  is deterministic and stable under corpus growth (a doc's keep/drop
  flips only when lower-hash docs arrive in its source). One
  source-keyed shuffle; at corpus scale source cardinality >> executor
  count, and residual heavy sources re-balance via AQE skew handling.

All three are pure window/hash compositions — one codegen stage plus
the single shuffle each needs — with DuckDB oracle mirrors in
``__spark_entry__`` (row_number / ROWS-framed sum over identical
(hash, key) orders, so values match bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geotiff_processor_spark.operators.dedup import sql_hash60

SHUFFLE_SEED = 7
N_SHARDS = 64
PACK_BUDGET = 512


def sql_shuffle_h(key_expr: str, dialect: str = "spark",
                  seed: int = SHUFFLE_SEED) -> str:
    """Seeded 60-bit shuffle hash of a key; identical in both engines
    (both hash the same 's<seed>-<decimal>' string)."""
    cast_t = "varchar" if dialect == "duckdb" else "string"
    return sql_hash60(f"('s{seed}-' || cast({key_expr} as {cast_t}))",
                      dialect)


def shuffle_rank(docs: DataFrame, key_col: str = "doc_id",
                 seed: int = SHUFFLE_SEED,
                 n_shards: int = N_SHARDS) -> DataFrame:
    """(key, shard, pos): deterministic training-order shuffle.

    shard = h % n_shards, pos = rank of h within the shard. Size
    ``n_shards`` so one shard is one output file at the target scale
    (e.g. ~100k shards at 100 TB); the per-shard sort is Spark's
    normal per-partition window sort, not a global orderBy.
    """
    h = F.expr(sql_shuffle_h(key_col, "spark", seed))
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        docs.select(key_col, h.alias("h"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .select(key_col, "shard", "pos")
    )


def pack_sequences(docs: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text", budget: int = PACK_BUDGET,
                   seed: int = SHUFFLE_SEED,
                   n_shards: int = N_SHARDS) -> DataFrame:
    """(key, shard, n_tokens, seq_id, seq_offset): concat-and-split
    packing of the shuffled token stream into ``budget``-token
    sequences, per shard.

    seq_id/seq_offset locate where the doc STARTS in the shard's
    packed stream: start = (running token total before the doc),
    seq_id = start div budget, seq_offset = start mod budget. The
    whitespace token count mirrors textprep.chunk_tokens.
    """
    h = F.expr(sql_shuffle_h(key_col, "spark", seed))
    w = (Window.partitionBy("shard").orderBy("h", key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toks = F.size(F.split(F.col(text_col), " "))
    return (
        docs.select(key_col, h.alias("h"), toks.alias("n_tokens"))
        .withColumn("shard", (F.col("h") % n_shards).cast("int"))
        .withColumn("start",
                    (F.sum("n_tokens").over(w) - F.col("n_tokens")))
        .select(
            key_col, "shard",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.floor(F.col("start") / budget).cast("bigint")
            .alias("seq_id"),
            (F.col("start") % budget).cast("bigint").alias("seq_offset"),
        )
    )


def source_cap(docs: DataFrame, cap: int, key_col: str = "doc_id",
               source_col: str = "source",
               seed: int = SHUFFLE_SEED) -> DataFrame:
    """(key, source, src_rank, kept): per-source quota. kept=1 for the
    ``cap`` lowest-hash docs of each source — filtering on it IS the
    balanced corpus."""
    h = F.expr(sql_shuffle_h(key_col, "spark", seed))
    w = Window.partitionBy(source_col).orderBy("h", key_col)
    return (
        docs.select(key_col, source_col, h.alias("h"))
        .withColumn("src_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("kept", (F.col("src_rank") <= cap).cast("int"))
        .select(key_col, source_col, "src_rank", "kept")
    )


MIX_ALPHA = 0.3


def source_mix_weights(docs: DataFrame, alpha: float = MIX_ALPHA,
                       source_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens, weight, epochs): temperature-based
    data-mixture weighting — sampling weight for source l is
    n_tokens_l^alpha renormalized (alpha<1 upsamples small/rare
    sources, the standard multilingual/multi-source mixing rule; with
    alpha=1 the mix is proportional, with alpha=0 uniform).

    ``epochs`` = weight * total_tokens / n_tokens_l is how many passes
    over source l one epoch of the MIXED corpus implies — the quantity
    a pipeline checks against its repetition budget.

    Plan: one source-keyed partial-agg shuffle over fixed-width rows
    (token counting is map-side), then a single-row total broadcast
    back — source cardinality is tiny next to the corpus, so at 100 TB
    this is one cheap shuffle + one broadcast, no global sort.
    """
    from geotiff_processor_spark.functions.text import sql_token_count

    per = (
        docs.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr(sql_token_count(text_col, "spark")))
            .cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "w_raw",
            F.expr(f"power(cast(n_tokens as double), "
                   f"cast({alpha!r} as double))"))
    )
    tot = per.agg(F.sum("w_raw").alias("z"),
                  F.sum("n_tokens").alias("tok_total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("w_raw") / F.col("z"), 6).alias("weight"),
            F.round(F.col("w_raw") / F.col("z")
                    * F.col("tok_total").cast("double")
                    / F.col("n_tokens").cast("double"), 6).alias("epochs"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

def sql_es_key(weight_expr: str, key_col: str = "doc_id",
               salt: str = "ws1", dialect: str = "spark") -> str:
    """The A-ES order key in log domain: ln(u) / w, u = md5-uniform in
    (0, 1]. Taking the per-group top-k by this key samples WITHOUT
    replacement with inclusion probability proportional to weight
    (Efraimidis & Spirakis 2006, public literature) — and because u is
    an explicit md5-derived uniform, the sample is a PURE FUNCTION of
    the data: reproducible across runs, engines and corpus
    repartitioning (no rand()).

    Log domain (not u^(1/w)) keeps the key's absolute spread wide at
    any weight scale, so the 6-digit rounding that absorbs last-ulp
    libm differences between engines costs no real resolution; exact
    rounded ties (measure-zero apart from that rounding) are broken by
    key order downstream. Weights must be > 0.
    """
    h = sql_hash60(f"concat('{salt}:', cast({key_col} as string))"
                   if dialect == "spark" else
                   f"concat('{salt}:', cast({key_col} as varchar))",
                   dialect=dialect)
    u = f"(cast({h} as double) + 1.0) / {float(2 ** 60)!r}"
    return f"round(ln({u}) / ({weight_expr}), 6)"


def weighted_sample(docs: DataFrame, weight_expr: str, k: int,
                    group_cols: list[str] | None = None,
                    key_col: str = "doc_id",
                    n_salts: int = 8) -> DataFrame:
    """Per-group weighted sample of k documents (A-ES top-k).

    Returns (group_cols..., key_col, es_key double, sample_rank int).

    Scale shape: the same salted TWO-PHASE top-k as kmv_distinct — a
    per-(group, salt) local top-k bounds every window sort to
    ~k x group/(salts) rows, then a global top-k over <= k x n_salts
    candidates per group; provably equal to the direct per-group
    top-k, without ever sorting a whole hot group. Only (group, key,
    es_key) shuffle — document text never moves.
    """
    groups = list(group_cols or [])
    keyed = docs.select(
        *groups, key_col,
        F.expr(sql_es_key(weight_expr, key_col)).alias("es_key"))
    salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salts)).cast("int")
    w_local = Window.partitionBy(*groups, "salt") \
        .orderBy(F.desc("es_key"), key_col)
    local = (keyed.withColumn("salt", salt)
             .withColumn("rn", F.row_number().over(w_local))
             .filter(F.col("rn") <= k).drop("rn", "salt"))
    w_glob = Window.partitionBy(*groups) \
        .orderBy(F.desc("es_key"), key_col)
    return (local.withColumn("sample_rank",
                             F.row_number().over(w_glob))
            .filter(F.col("sample_rank") <= k))


def sql_weighted_sample(table: str, weight_expr: str, k: int,
                        group_cols: list[str] | None = None,
                        key_col: str = "doc_id") -> str:
    """Identical sample as DuckDB SQL (single-phase window — the
    salted two-phase is exactly equal by construction)."""
    groups = list(group_cols or [])
    gsel = ", ".join(groups) + (", " if groups else "")
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    es = sql_es_key(weight_expr, key_col, dialect="duckdb")
    return f"""
WITH keyed AS (
  SELECT {gsel}{key_col}, {es} AS es_key FROM {table}
)
SELECT {gsel}{key_col}, es_key,
       cast(rn as int) AS sample_rank
FROM (
  SELECT *, row_number() OVER (
      {part} ORDER BY es_key DESC, {key_col}) AS rn
  FROM keyed
) WHERE rn <= {k}
"""
