"""Bloom-prune join (operators/bloom.py): exact equivalence to the
plain join, real pruning power, and the broadcast-only probe plan."""

import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import bloom


def _frames(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("payload"))
    build = spark.range(0, 40).select(
        (F.col("id") * 13).alias("key"), F.lit("d").alias("dim"))
    return probe, build


def test_equals_plain_join(spark):
    probe, build = _frames(spark)
    got = {tuple(r) for r in
           bloom.bloom_prune_join(probe, build, "key").collect()}
    want = {tuple(r) for r in probe.join(build, "key").collect()}
    assert got == want and got


def test_no_false_negatives_and_real_pruning(spark):
    probe, build = _frames(spark)
    words = bloom.build_bloom_words(build, "key")
    kept = bloom.bloom_prune(probe, words, "key")
    # every truly-matching key survives
    missing = (probe.join(build.select("key"), "key", "left_semi")
               .join(kept.select("key"), "key", "left_anti").count())
    assert missing == 0
    # and the filter genuinely prunes non-matching probe rows
    n_probe, n_kept = probe.count(), kept.count()
    n_match = probe.join(build.select("key"), "key", "left_semi").count()
    assert n_kept < n_probe * 0.2
    assert n_kept >= n_match


def test_tiny_filter_still_correct(spark):
    """Saturated 256-bit filter: pruning power ~0 but never wrong."""
    probe, build = _frames(spark)
    got = {tuple(r) for r in
           bloom.bloom_prune_join(probe, build, "key",
                                  n_bits=256, k=2).collect()}
    want = {tuple(r) for r in probe.join(build, "key").collect()}
    assert got == want


def test_probe_path_is_broadcast_only(spark):
    probe, build = _frames(spark)
    words = bloom.build_bloom_words(build, "key")
    df = bloom.bloom_prune(probe, words, "key")
    df.collect()  # finalize AQE so exchange reuse is visible
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 3
    # the word-table bit_or aggregation (the only shuffle anywhere) is
    # computed ONCE and reused for the other k-1 broadcast joins; the
    # probe stream itself never shuffles
    assert len(re.findall(r"ReusedExchange", plan)) >= 2, plan
    probe_side = plan.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in probe_side, probe_side
