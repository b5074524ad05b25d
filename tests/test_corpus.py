"""Corpus-assembly operators: deterministic shuffle, sequence packing,
per-source quotas — invariants, determinism/stability, and the
single-shuffle plan claims from the module docstring."""

import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import corpus


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> list[str]:
    return re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning"
                      r"|Exchange SinglePartition", plan)


def test_shuffle_rank_dense_positions_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    out = corpus.shuffle_rank(docs).collect()
    assert len(out) == docs.count()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # deterministic across runs (no rand(): md5 of a seeded key)
    again = corpus.shuffle_rank(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed is a different permutation
    other = corpus.shuffle_rank(docs, seed=8).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_pack_sequences_contiguous_token_stream(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    budget = corpus.PACK_BUDGET
    out = corpus.pack_sequences(docs).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq_id * budget + r.seq_offset)
        # concat-and-split: doc starts tile the stream with no gaps
        start = 0
        for r in rows:
            assert r.seq_id * budget + r.seq_offset == start, (shard, r)
            assert 0 <= r.seq_offset < budget
            start += r.n_tokens
    # pack order == shuffle order (same hash, same tiebreak)
    pos = {r.doc_id: (r.shard, r.pos)
           for r in corpus.shuffle_rank(docs.select("doc_id")).collect()}
    for shard, rows in by_shard.items():
        order = [r.doc_id for r in rows]
        assert order == sorted(order, key=lambda d: pos[d][1])
        assert all(pos[d][0] == shard for d in order)


def test_pack_sequences_token_counts_match_whitespace_split(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    got = {r.doc_id: r.n_tokens
           for r in corpus.pack_sequences(docs).collect()}
    want = {r.doc_id: r.n
            for r in docs.select(
                "doc_id",
                F.size(F.split("text", " ")).alias("n")).collect()}
    assert got == want


def test_source_cap_quota_and_growth_stability(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    cap = 7
    out = corpus.source_cap(docs, cap=cap).collect()
    per_src: dict = {}
    for r in out:
        per_src.setdefault(r.source, []).append(r)
    sizes = {r.source: 0 for r in out}
    for r in docs.collect():
        sizes[r.source] += 1
    for src, rows in per_src.items():
        kept = [r for r in rows if r.kept == 1]
        assert len(kept) == min(cap, sizes[src]), src
        assert sorted(r.src_rank for r in rows) == \
            list(range(1, len(rows) + 1))
    # growth stability: on a sub-corpus, ranks can only shrink, so
    # every doc kept in the FULL corpus is also kept in the subset
    sub = docs.filter(F.col("doc_id") % 2 == 0)
    kept_sub = {r.doc_id for r in
                corpus.source_cap(sub, cap=cap).collect() if r.kept == 1}
    kept_full_in_sub = {r.doc_id for r in out
                        if r.kept == 1 and r.doc_id % 2 == 0}
    assert kept_full_in_sub <= kept_sub


def test_corpus_ops_single_shuffle_plans(spark, sf_dir):
    """Each op needs exactly ONE hash shuffle (its window partitioning);
    packing's running sum reuses the shard partitioning rather than
    adding an exchange."""
    docs = _docs(spark, sf_dir)
    for df in (corpus.shuffle_rank(docs.select("doc_id")),
               corpus.pack_sequences(docs.select("doc_id", "text")),
               corpus.source_cap(docs.select("doc_id", "source"), cap=30)):
        plan = _plan(df)
        assert len(_exchanges(plan)) == 1, plan
        # the global-sort trap: no rangepartitioning anywhere
        assert "rangepartitioning" not in plan, plan


def test_source_mix_weights_invariants(spark, sf_dir):
    """Weights form a distribution; alpha=1 is proportional mixing;
    alpha=0 is uniform; alpha<1 upsamples the smallest source (its
    epochs exceed the largest source's)."""
    docs = _docs(spark, sf_dir).select("source", "text")
    rows = corpus.source_mix_weights(docs).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    small = min(rows, key=lambda r: r.n_tokens)
    big = max(rows, key=lambda r: r.n_tokens)
    assert small.epochs > big.epochs
    # alpha=1: weight == n_tokens / total (proportional), epochs == 1
    tot = sum(r.n_tokens for r in rows)
    for r in corpus.source_mix_weights(docs, alpha=1.0).collect():
        n = next(x.n_tokens for x in rows if x.source == r.source)
        assert abs(r.weight - n / tot) < 1e-5
        assert abs(r.epochs - 1.0) < 1e-5
    # alpha=0: uniform over sources
    uni = corpus.source_mix_weights(docs, alpha=0.0).collect()
    for r in uni:
        assert abs(r.weight - 1.0 / len(uni)) < 1e-5


def test_source_mix_weights_single_shuffle_plus_broadcast(spark, sf_dir):
    """One source-keyed exchange (plus the 1-row total's single
    partition) — token counting stays map-side; no global sort."""
    docs = _docs(spark, sf_dir).select("source", "text")
    plan = _plan(corpus.source_mix_weights(docs))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Sort " not in plan.replace("SortAggregate", "")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_duckdb(spark, sf_dir):
    import duckdb
    from geotiff_processor_spark.operators.corpus import (
        sql_weighted_sample, weighted_sample)
    from geotiff_processor_spark.testing import duck_norm, spark_norm
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = "(cast(n_chars as double) / cast(500 as double))"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM"
            f" '{sf_dir}/documents.parquet'")
    sc, sr = spark_norm(weighted_sample(docs, w, 10, ["source"]))
    dc, dr = duck_norm(con, sql_weighted_sample(
        "documents", w, 10, ["source"]))
    assert sc == dc and sr == dr and len(sr) > 0


def test_weighted_sample_two_phase_equals_direct(spark):
    """The salted local top-k then global top-k must select EXACTLY
    the direct per-group top-k (every global winner is in its salt
    bucket's local top-k)."""
    from pyspark.sql import Window
    from geotiff_processor_spark.operators.corpus import (
        sql_es_key, weighted_sample)
    rows = [(i, f"s{i % 3}", 1.0 + (i % 7)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    got = weighted_sample(df, "w", 15, ["source"]).select(
        "source", "doc_id", "sample_rank")
    keyed = df.selectExpr("source", "doc_id",
                          f"{sql_es_key('w')} AS es_key")
    wspec = Window.partitionBy("source").orderBy(
        F.desc("es_key"), "doc_id")
    direct = (keyed.withColumn("sample_rank",
                               F.row_number().over(wspec))
              .filter("sample_rank <= 15")
              .select("source", "doc_id", "sample_rank"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_weighted_sample_prefers_heavy_docs(spark):
    """Inclusion probability must track weight: with half the corpus
    at weight 9 and half at weight 1, a k=200-of-2000 sample should be
    dominated by the heavy class (expected ~90%)."""
    from geotiff_processor_spark.operators.corpus import weighted_sample
    rows = [(i, "all", 9.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    out = weighted_sample(df, "w", 200, ["source"]).collect()
    heavy = sum(1 for r in out if r["doc_id"] % 2 == 0)
    assert len(out) == 200
    assert heavy > 150  # ~180 expected; far above the unweighted 100


def test_weighted_sample_stable_under_repartition(spark):
    """No rand(), no partition-order dependence: the sample is a pure
    function of the data."""
    from geotiff_processor_spark.operators.corpus import weighted_sample
    rows = [(i, f"s{i % 4}", 1.0 + (i % 5)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    a = sorted(map(tuple, weighted_sample(df, "w", 8, ["source"]).collect()))
    b = sorted(map(tuple, weighted_sample(
        df.repartition(17, "doc_id"), "w", 8, ["source"]).collect()))
    assert a == b
