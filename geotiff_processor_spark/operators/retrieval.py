"""BM25 document scoring (retrieval-quality prior for corpus curation).

Okapi BM25 (Robertson & Zaragoza 2009, public literature) over the
``documents`` table: the lexical-relevance score web-corpus pipelines
use to rank documents against a query term set (e.g. quality probes,
topic filters, decontamination spot checks) — the retrieval sibling of
``operators/ann.py``'s embedding scorers.

Scale shape (the only acceptable one at 10^12 docs):
- corpus stats N and avgdl are ONE tiny aggregate collected to the
  driver and re-entered as literals (the collect-tiny-stat /
  driver-branch pattern of plans/adaptive.py) — never a cross join;
- per-term document frequencies come from the SAME single corpus scan
  as the term-frequency explode, aggregated over (term) — a
  |terms|-row table joined back via an explicit broadcast;
- the per-(doc, term) partial agg is the one corpus-sized shuffle;
  document text never shuffles (only (doc_id, word) pairs ALREADY
  filtered to the query terms — the filter sits under the explode, so
  non-matching words die map-side).

Reference analog: none (the reference is a raster pipeline); this
operator belongs to the training-data curation family the engine adds
for the 100 TB corpus use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(docs: DataFrame, terms: list[str],
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75, round_to: int = 6) -> DataFrame:
    """Score every document containing >= 1 query term.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    Returns (doc_id, bm25 double rounded to ``round_to``) — the float
    rounding convention the repo's oracle comparisons use.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    # corpus stats: one tiny aggregate -> literals
    stats = (docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"))
        .collect()[0])
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])

    words = (docs
             .select(F.col("doc_id"),
                     F.size(F.split(F.col(text_col), " "))
                     .cast("double").alias("dl"),
                     F.explode(F.split(F.col(text_col), " "))
                     .alias("term"))
             .filter(F.col("term").isin(terms)))
    tf = (words.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("double").alias("tf"),
               F.first("dl").alias("dl")))
    # df derives FROM tf (one row per (doc, term)), so the corpus scan
    # + explode + (doc, term) exchange is computed once and reused
    # (ReusedExchange) instead of a second full corpus pass
    df = (tf.groupBy("term")
          .agg(F.count(F.lit(1)).cast("double").alias("df")))
    idf = df.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)).alias("idf"))
    contrib = (tf.join(F.broadcast(idf), "term")
               .withColumn(
                   "part",
                   F.col("idf") * F.col("tf") * (k1 + 1.0)
                   / (F.col("tf")
                      + k1 * (1.0 - b + b * F.col("dl") / avgdl))))
    return (contrib.groupBy("doc_id")
            .agg(F.round(F.sum("part"), round_to).alias("bm25")))


def sql_bm25(terms: list[str], table: str = "documents",
             k1: float = 1.2, b: float = 0.75,
             round_to: int = 6) -> str:
    """The identical arithmetic as dialect-neutral SQL (DuckDB oracle
    half of the contract; ln() is natural log in both engines)."""
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH stats AS (
  SELECT cast(count(*) as double) AS n,
         avg(cast(len(string_split(text, ' ')) as double)) AS avgdl
  FROM {table}
), words AS (
  SELECT doc_id,
         cast(len(string_split(text, ' ')) as double) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM {table}
), hits AS (
  SELECT doc_id, dl, term FROM words WHERE term IN ({tlist})
), tf AS (
  SELECT doc_id, term, cast(count(*) as double) AS tf, any_value(dl) AS dl
  FROM hits GROUP BY doc_id, term
), idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - cast(count(DISTINCT doc_id) as double) + 0.5)
                / (cast(count(DISTINCT doc_id) as double) + 0.5)) AS idf
  FROM hits GROUP BY term
)
SELECT tf.doc_id,
       round(sum(idf.idf * tf.tf * ({k1} + 1.0)
                 / (tf.tf + {k1} * (1.0 - {b}
                    + {b} * tf.dl / (SELECT avgdl FROM stats)))),
             {round_to}) AS bm25
FROM tf JOIN idf USING (term)
GROUP BY tf.doc_id
"""


def build_postings(docs: DataFrame, text_col: str = "text",
                   min_df: int = 1, max_df: int | None = None,
                   n_segments: int = 1) -> DataFrame:
    """Inverted index (posting lists) over the corpus — the retrieval
    structure behind decontamination lookups, keyword probes and BM25
    serving.

    Returns (word, [segment,] df, total_tf, doc_ids, tfs) with
    doc_ids sorted ascending and tfs aligned.

    Scale shape: the (word, doc_id) term-frequency partial agg is the
    one corpus-sized shuffle; the per-word list build is the classic
    posting-skew hazard (a stopword's list is corpus-sized), handled
    the way real IR systems do:
    - ``max_df`` prunes stopword-grade words BEFORE list building (the
      filter runs on the (word, df) aggregate, so pruned words never
      materialize lists);
    - ``n_segments > 1`` shards lists by hash(doc_id) % n_segments into
      (word, segment) rows — each segment list is bounded by
      corpus/n_segments, and a serving layer merges segments lazily.
    ``array_sort`` over (doc_id, tf) structs keeps output deterministic
    under any partitioning.
    """
    tf = (docs
          .select(F.col("doc_id"),
                  F.explode(F.split(F.col(text_col), " ")).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word", "doc_id")
          .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    keys = ["word"]
    if n_segments > 1:
        tf = tf.withColumn(
            "segment",
            (F.abs(F.hash("doc_id")) % n_segments).cast("int"))
        keys.append("segment")
    if max_df is not None or (min_df > 1 and n_segments > 1):
        # BOTH df bounds computed word-wide (never per segment) so
        # pruning semantics don't depend on n_segments; tiny
        # (vocab-sized) broadcast semi-join
        word_df = (tf.groupBy("word")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("wdf")))
        cond = F.col("wdf") >= min_df
        if max_df is not None:
            cond = cond & (F.col("wdf") <= max_df)
        tf = tf.join(F.broadcast(word_df.filter(cond).select("word")),
                     "word", "left_semi")
    posts = (tf.groupBy(*keys)
             .agg(F.count(F.lit(1)).cast("bigint").alias("df"),
                  F.sum("tf").cast("bigint").alias("total_tf"),
                  F.array_sort(
                      F.collect_list(F.struct("doc_id", "tf")))
                  .alias("pl")))
    if n_segments == 1 and min_df > 1:
        # unsegmented: per-group df IS the word-wide df — the cheap
        # post-filter is exact and skips the extra aggregate
        posts = posts.filter(F.col("df") >= min_df)
    return (posts
            .withColumn("doc_ids",
                        F.expr("transform(pl, x -> x.doc_id)"))
            .withColumn("tfs", F.expr("transform(pl, x -> x.tf)"))
            .drop("pl"))


def sql_postings(table: str = "documents", min_df: int = 1) -> str:
    """Unsegmented postings as DuckDB SQL (oracle half)."""
    return f"""
WITH tf AS (
  SELECT word, doc_id, cast(count(*) as bigint) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM {table})
  WHERE word <> ''
  GROUP BY word, doc_id
)
SELECT word,
       cast(count(*) as bigint) AS df,
       cast(sum(tf) as bigint) AS total_tf,
       list(doc_id ORDER BY doc_id) AS doc_ids,
       list(tf ORDER BY doc_id) AS tfs
FROM tf GROUP BY word
HAVING count(*) >= {min_df}
"""
