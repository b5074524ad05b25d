"""Dedup operators: exact, MinHash/LSH, Jaccard verify, SimHash."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import dedup


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")


def test_exact_dup_groups_finds_planted(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    dupes = docs.filter(F.col("doc_id") % 10 == 0) \
        .withColumn("doc_id", F.col("doc_id") + 1000)
    groups = dedup.exact_dup_groups(docs.unionByName(dupes))
    rows = groups.collect()
    assert len(rows) == docs.filter(F.col("doc_id") % 10 == 0).count()
    assert all(r["n_docs"] == 2 for r in rows)
    assert all(r["keeper"] < 1000 for r in rows)


def test_minhash_identical_texts_identical_sigs(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 5000)
    sigs = dedup.minhash_signatures(docs.unionByName(clones))
    a = sigs.filter(F.col("doc_id") < 5000)
    b = sigs.filter(F.col("doc_id") >= 5000).withColumn(
        "doc_id", F.col("doc_id") - 5000)
    assert a.exceptAll(b).count() == 0


def test_lsh_finds_exact_clones(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 5000)
    corpus = docs.unionByName(clones)
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(corpus))
    hits = pairs.filter(F.col("key_b") - F.col("key_a") == 5000).count()
    assert hits == 50  # every clone pair shares all bands


def test_jaccard_verify_scores_clones_one(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(20)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 5000)
    corpus = docs.unionByName(clones)
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(corpus))
    verified = dedup.jaccard_verify(corpus, pairs, threshold=0.99)
    exact = verified.filter(F.col("key_b") - F.col("key_a") == 5000)
    assert exact.count() == 20
    assert exact.filter(F.col("jaccard") < 1.0).count() == 0


def test_simhash_identical_equal_and_differs(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(30)
    sh = dedup.simhash(docs)
    again = dedup.simhash(docs)
    assert sh.exceptAll(again).count() == 0
    assert sh.select("simhash").distinct().count() > 1


def test_first_wins_semantics(spark):
    df = spark.createDataFrame(
        [(1, "b", 10), (1, "a", 20), (2, "c", 5)], ["k", "v", "o"])
    out = dedup.first_wins(df, "k", "o").collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: "b", 2: "c"}
