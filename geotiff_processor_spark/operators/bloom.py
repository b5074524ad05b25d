"""Bloom-prune join: explicit semi-join reduction for selective joins.

The 100 TB problem: a fact-to-filtered-dim join shuffles the ENTIRE
fact table even when the dim filter keeps 5% of keys — the shuffle, not
the join, is the bottleneck. The fix every warehouse engine applies
(and Spark itself via ``spark.sql.optimizer.runtime.bloomFilter.*``,
which is heuristic-gated and invisible) is a runtime Bloom filter:
summarize the build side's keys into bits, broadcast the bits, and drop
probe rows that cannot match BEFORE the exchange. This operator makes
that plan explicit, deterministic and testable.

Construction is fully native (no UDF, no driver collect):
- build side: k xxhash64 positions per key -> (word_idx, bit) -> ONE
  map-side-combined ``bit_or`` aggregation into n_bits/64 bigint words
  (a 1 MiB filter = 16 Ki rows — broadcastable at any build scale).
- probe side: k broadcast hash-joins against the word table + bit
  tests, all inside whole-stage codegen; a probe key is kept only if
  ALL k bits are set. No false negatives (the final join still runs,
  so false positives cost only wasted shuffle rows, never wrong rows).

The result therefore EQUALS the plain join — which is exactly what the
DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, n_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits))
            for i in range(k)]


def build_bloom_words(build: DataFrame, on: str,
                      n_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """(widx, word): the Bloom bitmap as bigint words. One shuffle of
    (widx, bit) pairs with map-side partial bit_or — at most
    ``n_bits/64`` rows survive regardless of build cardinality."""
    pos = F.explode(F.array(*_positions(F.col(on), n_bits, k)))
    return (
        build.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("bigint").alias("widx"),
            # SQL expr: python F.shiftleft only takes a literal shift
            F.expr("shiftleft(cast(1 as bigint),"
                   " cast(pmod(pos, 64) as int))").alias("bit"))
        .groupBy("widx").agg(F.bit_or("bit").alias("word"))
    )


def bloom_prune(probe: DataFrame, words: DataFrame, on: str,
                n_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Drop probe rows whose key is definitely absent from the filter.

    k broadcast joins + bit tests, zero shuffles on the probe side. A
    word missing from the sparse word table means bits there are 0, so
    the inner join's drop IS the bit test for that position."""
    pruned = probe
    for i, p in enumerate(_positions(F.col(on), n_bits, k)):
        w = words.select(F.col("widx").alias(f"_bw{i}"),
                         F.col("word").alias(f"_bword{i}"))
        pruned = (
            pruned.withColumn(f"_bp{i}", p)
            .join(F.broadcast(w),
                  (F.col(f"_bp{i}") / 64).cast("bigint")
                  == F.col(f"_bw{i}"))
            .filter(
                F.expr(f"shiftleft(cast(1 as bigint),"
                       f" cast(pmod(_bp{i}, 64) as int))")
                .bitwiseAND(F.col(f"_bword{i}")) != 0)
            .drop(f"_bp{i}", f"_bw{i}", f"_bword{i}")
        )
    return pruned


def bloom_prune_join(probe: DataFrame, build: DataFrame, on: str,
                     n_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Inner equi-join with Bloom pre-pruning of the probe side.

    Identical rows to ``probe.join(build, on)`` — only the amount of
    probe data reaching the join's exchange changes. Inner joins only:
    outer semantics would need the dropped rows back."""
    words = build_bloom_words(build, on, n_bits, k)
    return bloom_prune(probe, words, on, n_bits, k).join(build, on)
