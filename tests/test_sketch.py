"""KMV cardinality sketch: exact cross-engine agreement, estimator
quality, small-group exact fallback, two-phase == single-phase."""

import duckdb

from geotiff_processor_spark.operators.sketch import (
    kmv_distinct, sql_kmv_distinct)
from geotiff_processor_spark.testing import duck_norm, spark_norm


def test_kmv_matches_duckdb_grouped(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{sf_dir}/events.parquet'")
    sc, sr = spark_norm(kmv_distinct(
        ev, "cast(user_id as string)", ["event_type"], k=128))
    dc, dr = duck_norm(con, sql_kmv_distinct(
        "cast(user_id as varchar)", "events", ["event_type"], k=128))
    assert sc == dc and sr == dr
    assert len(sr) > 0


def test_kmv_estimator_quality_and_exact_fallback(spark):
    rows = [(i, f"u{i % 997}") for i in range(20000)]
    df = spark.createDataFrame(rows, "i bigint, u string")
    out = kmv_distinct(df, "u", k=256).collect()
    assert len(out) == 1
    est = out[0]["est_distinct"]
    assert out[0]["n_min"] == 256
    assert abs(est - 997) / 997 < 0.25  # ~4 sigma at k=256
    # fewer distinct keys than k: exact count, not an estimate
    small = spark.createDataFrame(
        [(i, f"v{i % 10}") for i in range(100)], "i bigint, u string")
    o2 = kmv_distinct(small, "u", k=64).collect()[0]
    assert o2["n_min"] == 10 and o2["est_distinct"] == 10.0


def test_kmv_two_phase_equals_direct_min_k(spark):
    """The salted local top-k then global top-k must select EXACTLY
    the global k minimum hashes (set equality, any n_salts)."""
    from pyspark.sql import functions as F
    from geotiff_processor_spark.operators.dedup import sql_hash60

    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(500)], "u string")
    direct = sorted(
        r["h"] for r in df.select(
            F.expr(sql_hash60("u")).alias("h")).distinct().collect())[:32]
    for n_salts in (1, 4, 16):
        got = kmv_distinct(df, "u", k=32, n_salts=n_salts).collect()[0]
        # reconstruct the kept max == k-th smallest direct hash
        assert got["n_min"] == 32
        est = got["est_distinct"]
        import math
        exp = round(31 * 2.0 ** 60 / float(direct[31]), 6)
        assert est == exp, n_salts


def test_cms_overestimates_never_under(spark, sf_dir):
    """CMS guarantee: estimate >= exact for every token, with strict
    overestimates actually present at width 16 (collisions are real),
    and exact equality for the min-over-depth winner paths."""
    from geotiff_processor_spark.operators import sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sketch.cms_token_counts(docs).collect()
    assert rows
    assert all(r["cms_count"] >= r["exact_count"] for r in rows)
    assert any(r["cms_count"] > r["exact_count"] for r in rows)
    # a generous width removes collisions entirely: estimates exact
    wide = sketch.cms_token_counts(docs, width=1 << 20).collect()
    assert all(r["cms_count"] == r["exact_count"] for r in wide)


# ---------------------------------------------------------------------------
# HyperLogLog (explicit-register, oracle-checkable)
# ---------------------------------------------------------------------------

def test_hll_matches_duckdb_grouped(spark, sf_dir):
    from geotiff_processor_spark.operators.sketch import (
        hll_distinct, sql_hll_distinct)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM"
            f" '{sf_dir}/events.parquet'")
    sc, sr = spark_norm(hll_distinct(
        ev, "cast(user_id as string)", ["event_type"]))
    dc, dr = duck_norm(con, sql_hll_distinct(
        "cast(user_id as varchar)", "events", ["event_type"]))
    assert sc == dc and sr == dr
    assert len(sr) > 0


def test_hll_estimator_quality(spark):
    """m=64 registers => ~13% standard error; assert within ~3 sigma
    for a mid-size cardinality well past the linear-counting range."""
    from geotiff_processor_spark.operators.sketch import hll_distinct
    rows = [(i, f"u{i % 4999}") for i in range(20000)]
    df = spark.createDataFrame(rows, "i bigint, u string")
    out = hll_distinct(df, "u").collect()
    assert len(out) == 1
    est = out[0]["est_distinct"]
    assert abs(est - 4999) / 4999 < 0.40
    assert out[0]["n_registers"] == 64


def test_hll_small_range_linear_counting(spark):
    """Below ~2.5m the raw harmonic estimate is biased; the
    linear-counting branch (m * ln(m / empty)) must kick in and land
    near the exact count."""
    from geotiff_processor_spark.operators.sketch import hll_distinct
    df = spark.createDataFrame(
        [(i, f"v{i % 30}") for i in range(900)], "i bigint, u string")
    o = hll_distinct(df, "u").collect()[0]
    assert o["n_registers"] < 64  # genuinely in the small-range regime
    assert abs(o["est_distinct"] - 30) < 12
