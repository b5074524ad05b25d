"""PageRank: numpy power-iteration differential, conservation, plans."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import graph


def _numpy_pagerank(n, iters=5, d=0.85):
    """Independent dense reference over the same synthetic edges."""
    ranks = np.full(n, 1.0 / n)
    src = np.arange(n)
    dsts = [(src * a + b) % n for a, b in graph.LINK_COEFS]
    od = np.zeros(n)
    for dst in dsts:
        od[src] += 1
    for _ in range(iters):
        s = np.zeros(n)
        for dst in dsts:
            np.add.at(s, dst, ranks / od)
        ranks = (1 - d) / n + d * s
    return ranks


@pytest.mark.parametrize("n", [97, 1000])
def test_pagerank_matches_numpy(spark, n):
    events = spark.range(n).select(F.col("id").alias("event_id"))
    nodes = events.select(F.col("event_id").alias("page_id"))
    got = {r["page_id"]: r["rank"] for r in
           graph.pagerank(nodes, graph.synth_edges(events, n), n,
                          iters=5).collect()}
    ref = _numpy_pagerank(n)
    assert len(got) == n
    for i in range(n):
        assert got[i] == pytest.approx(ref[i], abs=5e-7), i


def test_pagerank_conserves_mass(spark):
    """No dangling nodes in the 3-out-regular graph => total rank stays
    1 (the fixed-iteration invariant that catches a lost-contribution
    bug immediately)."""
    n = 500
    events = spark.range(n).select(F.col("id").alias("event_id"))
    nodes = events.select(F.col("event_id").alias("page_id"))
    out = graph.pagerank(nodes, graph.synth_edges(events, n), n, iters=3)
    total = out.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-3)


def test_pagerank_iteration_shuffle_shape(spark):
    """One rank-vector join + one dst-keyed partial agg per round: the
    per-iteration job must not shuffle the edge list redundantly."""
    import re
    n = 200
    events = spark.range(n).select(F.col("id").alias("event_id"))
    edges = graph.synth_edges(events, n)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ed = edges.join(deg, "src").select("src", "dst", "od")
    ranks = events.select(F.col("event_id").alias("id"),
                          F.lit(1.0 / n).alias("r"))
    contrib = (ed.join(ranks, ed.src == ranks.id)
               .select(F.col("dst").alias("id"),
                       (F.col("r") / F.col("od")).alias("c"))
               .groupBy("id").agg(F.sum("c").alias("s")))
    plan = contrib._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 4, plan[:2000]
