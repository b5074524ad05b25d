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


def test_exact_substr_dedup_semantics(spark):
    """Planted overlap: docs A and B share a 10-token run (k=4 =>
    7 duplicated gram positions each); C is disjoint; D is shorter
    than k (zero grams, still present in the output)."""
    run = " ".join(f"w{i}" for i in range(10))
    a = run + " xa ya za"
    b = "pb qb " + run
    c = " ".join(f"c{i}" for i in range(12))
    d = "tiny doc"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup.exact_substr_dedup(df, k=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc A: 13 tokens -> 10 grams; grams starting inside the run
    # at positions 1..7 are shared with B
    assert out[1]["n_grams"] == 10 and out[1]["dup_grams"] == 7
    assert out[2]["n_grams"] == 9 and out[2]["dup_grams"] == 7
    assert out[3]["n_grams"] == 9 and out[3]["dup_grams"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["dup_grams"] == 0
    assert out[4]["dup_frac"] == 0.0
    assert out[1]["dup_frac"] == 0.7


def test_exact_substr_within_doc_repeat_not_cross_doc(spark):
    """A gram repeated only INSIDE one doc is not cross-doc duplicated
    (n_docs >= 2 is the rule), and the partial-agg occ rollup keeps
    the position count right."""
    rep = "x y z x y z x y z"  # 'x y z' 3x, 9 tokens, k=3 -> 7 grams
    df = spark.createDataFrame(
        [(1, rep), (2, "a b c d e")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup.exact_substr_dedup(df, k=3).collect()}
    assert out[1]["n_grams"] == 7 and out[1]["dup_grams"] == 0
    assert out[2]["dup_grams"] == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.sampled_from("abc"), min_size=0, max_size=12),
                min_size=1, max_size=8),
       st.integers(2, 4))
def test_exact_substr_matches_brute_force(spark, token_lists, k):
    """Distributed result == brute-force set arithmetic on any tiny
    corpus (single-char tokens over a 3-letter alphabet force heavy
    cross-doc collisions)."""
    rows = [(i, " ".join(t)) for i, t in enumerate(token_lists)]
    got = {r["doc_id"]: (r["n_grams"], r["dup_grams"]) for r in
           dedup.exact_substr_dedup(
               spark.createDataFrame(rows, ["doc_id", "text"]),
               k=k).collect()}
    # brute force
    from collections import Counter
    grams = {}
    for i, t in enumerate(token_lists):
        toks = " ".join(t).split(" ")  # mirror split semantics ('' case)
        gs = [tuple(toks[j:j + k]) for j in range(len(toks) - k + 1)] \
            if len(toks) >= k else []
        grams[i] = gs
    docs_per = Counter()
    for i, gs in grams.items():
        for g in set(gs):
            docs_per[g] += 1
    for i, gs in grams.items():
        dup = sum(1 for g in gs if docs_per[g] >= 2)
        assert got[i] == (len(gs), dup), (i, token_lists)
