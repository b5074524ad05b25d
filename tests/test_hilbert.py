"""Hilbert curve index: algorithmic ground truth (inverse walk,
adjacency/locality), numpy==scalar==SQL==Spark agreement, and the
plan shape (pure codegen, no UDF, no shuffle before the agg)."""

import duckdb
import numpy as np
import pytest

from geotiff_processor_spark.functions import hilbert as H
from geotiff_processor_spark.testing import duck_norm, spark_norm


def test_level1_canonical_order():
    assert [H.hilbert_d_scalar(x, y, 1)
            for (x, y) in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]


def test_adjacency_and_inverse_level6():
    """THE locality property: consecutive d are always grid
    neighbours (manhattan distance exactly 1), exhaustively at
    level 6 (4096 cells); and d2xy is xy2d's true inverse."""
    L = 6
    xy = [H.hilbert_d_to_xy(d, L) for d in range(4 ** L)]
    assert all(abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1
               for a, b in zip(xy, xy[1:]))
    assert all(H.hilbert_d_scalar(x, y, L) == d
               for d, (x, y) in enumerate(xy))
    # bijection over the full grid
    assert len(set(xy)) == 4 ** L


def test_numpy_equals_scalar():
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 256, size=2000)
    ys = rng.randint(0, 256, size=2000)
    nd = H.np_hilbert_d(xs, ys, 8)
    assert all(int(v) == H.hilbert_d_scalar(int(a), int(b), 8)
               for a, b, v in zip(xs, ys, nd))


def test_spark_equals_duckdb_equals_numpy(spark):
    rng = np.random.RandomState(11)
    pts = [(int(x), int(y)) for x, y in
           zip(rng.randint(0, 256, 500), rng.randint(0, 256, 500))]
    df = spark.createDataFrame(pts, "xq bigint, yq bigint")
    out = H.with_hilbert(df, "xq", "yq", level=8)
    sc, sr = spark_norm(out)
    con = duckdb.connect()
    con.sql("CREATE TABLE pts (xq BIGINT, yq BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    dc, dr = duck_norm(con, H.sql_hilbert_chain(
        "SELECT xq, yq FROM pts", "xq", "yq", 8))
    assert sc == dc and sr == dr
    got = {(r["xq"], r["yq"]): r["hilbert_d"] for r in out.collect()}
    assert all(got[p] == H.hilbert_d_scalar(p[0], p[1], 8) for p in pts)


def test_plan_no_udf_no_exchange(spark):
    """The unrolled walk must stay native: no BatchEvalPython /
    ArrowEval in the plan, no Exchange (map-only), and codegen intact
    (no janino fallback means the CASE chain is within limits)."""
    df = spark.range(1000).selectExpr(
        "id % 256 AS xq", "cast(id / 256 as bigint) AS yq")
    out = H.with_hilbert(df, "xq", "yq", level=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "*(1)" in plan  # one fused whole-stage-codegen span


def test_block_span_bound(spark):
    """Per-64-cell block, d_max - d_min <= 63 by construction — the
    contiguity claim the query exposes."""
    df = spark.range(4096).selectExpr(
        "cast(id % 64 as bigint) AS xq", "cast(id / 64 as bigint) AS yq")
    out = H.with_hilbert(df, "xq", "yq", level=6)
    import pyspark.sql.functions as F
    spans = (out.groupBy(F.expr("cast(floor(hilbert_d / 64) as bigint)")
                         .alias("b"))
             .agg((F.max("hilbert_d") - F.min("hilbert_d")).alias("s"),
                  F.count("*").alias("n")).collect())
    assert all(r["s"] == 63 and r["n"] == 64 for r in spans)


def test_bbox_ranges_exact_cover_and_pruning():
    from geotiff_processor_spark.functions.hilbert import bbox_ranges
    # aligned quadrant: exactly ONE contiguous range
    r = bbox_ranges(64, 127, 128, 191, 8)
    assert len(r) == 1 and r[0][1] - r[0][0] == 64 * 64 - 1
    # unaligned 32x32: exact cover, far fewer ranges than cells
    r2 = bbox_ranges(100, 131, 60, 91, 8)
    assert sum(hi - lo + 1 for lo, hi in r2) == 1024
    assert len(r2) <= 16
    # disjoint + sorted
    assert all(a[1] < b[0] for a, b in zip(r2, r2[1:]))


def test_ranges_pred_equals_direct_bbox(spark):
    """The OR-of-BETWEEN range predicate must select EXACTLY the rows
    the direct xq/yq bbox predicate selects — the cover is exact, not
    approximate."""
    from geotiff_processor_spark.functions.hilbert import (
        bbox_ranges, filter_by_ranges, with_hilbert)
    df = spark.range(20000).selectExpr(
        "id AS rid", "cast(id % 256 as bigint) AS xq",
        "cast((id * 7919) % 256 as bigint) AS yq")
    hd = with_hilbert(df, "xq", "yq", level=8)
    pruned = filter_by_ranges(hd, bbox_ranges(100, 131, 60, 91, 8))
    via_ranges = {r["rid"] for r in pruned.collect()}
    direct = {r["rid"] for r in df.filter(
        "xq BETWEEN 100 AND 131 AND yq BETWEEN 60 AND 91").collect()}
    assert via_ranges == direct and len(direct) > 0


def test_persisted_sorted_scan_prunes_row_groups(spark, tmp_path):
    """VERDICT r5 item 4 (round 6): on a PERSISTED hilbert_d-sorted
    table the literal OR-of-BETWEEN bbox predicate (a) pushes to the
    parquet scan (PushedFilters carries the hilbert_d bounds — there
    is no in-plan walk to substitute, so the blowup hazard that makes
    filter_by_ranges use a semi join does not exist here) and (b)
    actually SKIPS row groups: the scan's numOutputRows metric — rows
    surviving parquet min/max pruning BEFORE Spark's own Filter — is a
    strict subset of the table. This is the 100 TB payoff the curve
    order exists for."""
    from pyspark.sql import functions as F
    n = 200_000
    df = spark.range(n).selectExpr(
        "id AS rid", "cast(id % 256 as bigint) AS xq",
        "cast((id * 7919) % 256 as bigint) AS yq")
    hd = H.with_hilbert(df, "xq", "yq", level=8)
    path = str(tmp_path / "hilbert_sorted")
    (hd.repartitionByRange(16, F.col("hilbert_d"))
       .sortWithinPartitions("hilbert_d")
       .write.mode("overwrite").parquet(path))
    t = spark.read.parquet(path)
    pred = H.sql_ranges_pred(H.bbox_ranges(100, 131, 60, 91, 8))
    q = t.filter(pred)
    got = {r["rid"] for r in q.collect()}
    # exactness: literal ranges on the stored column == direct bbox
    want = {r["rid"] for r in df.filter(
        "xq BETWEEN 100 AND 131 AND yq BETWEEN 60 AND 91").collect()}
    assert got == want and len(want) > 0
    plan = q._jdf.queryExecution().executedPlan()
    txt = plan.toString()
    assert "PushedFilters" in txt and "hilbert_d" in txt.split(
        "PushedFilters", 1)[1][:400], txt[:2000]
    scan = plan.collectLeaves().apply(0)
    rows_after_rg_prune = scan.metrics().apply("numOutputRows").value()
    # min/max stats on the sorted column must skip most of the table
    # before Spark's own Filter runs (observed ~49k of 200k)
    assert rows_after_rg_prune < n // 2, rows_after_rg_prune
    assert rows_after_rg_prune >= len(want)
