"""Web-text preparation operators for the training-data pipeline.

Beyond the reference's raster scope (it has no text surface), these are
the corpus-preparation stages a 100 TB Common-Crawl-style pipeline runs
between raw ingest and tokenization:

- ``repetition_signals``: Gopher-style repetition quality signals over
  word n-grams (Rae et al. 2021, "Scaling Language Models", App. A —
  public literature). Every signal is per-document, so it runs as a
  shuffle-free in-array sort + run-length walk (round 6).
- ``chunk_tokens``: fixed-width/strided token windows (training-sample
  prep). Pure map-side 1:N — sequence + explode + slice, no shuffle.
- ``pii_scrub``: email / digit-run redaction with match counts. Native
  ``regexp_replace``/``regexp_count`` in one codegen stage; patterns
  avoid backslash classes so the identical text runs in Spark SQL and
  DuckDB (RE2) — same rationale as functions/text.py's stopword SQL.
- ``stratified_sample``: deterministic per-source downsampling via an
  md5-derived uniform (dedup.sql_hash60) against a broadcast rate
  table. Map-side filter, no shuffle, reproducible across runs and
  engines (no rand()).
- ``decontaminate``: benchmark-overlap flagging via word n-gram
  collision (Brown et al. 2020 App. C) — broadcast benchmark digests,
  map-side gram hash join, per-doc hit counts.

Each operator has a DuckDB-dialect SQL mirror in ``__spark_entry__`` so
the differential oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geotiff_processor_spark.operators.dedup import sql_hash60
from geotiff_processor_spark.operators.par import spread

# dialect-safe regexes: no backslash escapes (Java regex vs RE2 string
# escaping diverges), character classes only, '-' placed last
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
NUM_RE = "[0-9][0-9][0-9]+"

CHUNK_WIDTH = 32
CHUNK_STRIDE = 16
REP_NGRAM = 2


def _grams(text_col: str, n: int) -> F.Column:
    """Non-distinct word n-gram array (cf. dedup.shingles, which
    dedups); (len - n + 1) grams, min 1 (short docs yield their text)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def repetition_signals(docs: DataFrame, key_col: str = "doc_id",
                       text_col: str = "text",
                       n: int = REP_NGRAM) -> DataFrame:
    """Per-doc n-gram repetition stats: (key, n_grams, n_distinct_grams,
    max_gram_rep, dup_gram_frac, top_gram_frac, dup_char_frac).

    dup_gram_frac  = 1 - distinct/total        (Gopher dup-ngram rate)
    top_gram_frac  = occurrences of the most frequent gram / total
    dup_char_frac  = chars inside repeated grams / total gram chars

    Every stat is a pure function of ONE document, so no row ever needs
    to leave its scan task: the gram array is sorted in place and a
    single run-length ``aggregate`` walk extracts distinct count, max
    repetition and duplicated chars — zero shuffles, zero digests
    (round 6; the previous explode -> two digest-keyed exchanges form
    burned its time in 1-2 AQE-coalesced reduce tasks: 18.5 s at sf1
    for ~50 k docs). O(grams log grams) per doc, scale-free.
    """
    # run-length walk over the per-doc sorted gram array: one pass.
    # state: (prev gram, current run, distinct runs, max run,
    #         duplicated chars, total chars). The token and gram arrays
    #  are let-bound as lambda variables (transform(array(x), v ->)[0])
    # so CollapseProject cannot inline the split/sort into every use —
    # see winnow_fingerprints.
    walk_of_g = (
        "aggregate(g,"
        " struct(cast(null as string) as prev, 0L as run, 0L as nd,"
        "        0L as mx, 0L as dup, 0L as chars),"
        " (s, x) -> case"
        "   when s.prev is null then struct(x as prev, 1L as run,"
        "     1L as nd, s.mx as mx, s.dup as dup,"
        "     s.chars + length(x) as chars)"
        "   when x = s.prev then struct(x as prev, s.run + 1L as run,"
        "     s.nd as nd, s.mx as mx, s.dup as dup,"
        "     s.chars + length(x) as chars)"
        "   else struct(x as prev, 1L as run, s.nd + 1L as nd,"
        "     greatest(s.mx, s.run) as mx,"
        "     s.dup + if(s.run > 1L, s.run * length(s.prev), 0L) as dup,"
        "     s.chars + length(x) as chars) end,"
        " s -> struct(s.nd as nd, greatest(s.mx, s.run) as mx,"
        "   s.dup + if(s.run > 1L, s.run * length(s.prev), 0L) as dup,"
        "   s.chars as chars))")
    grams_of_t = (
        f"transform(sequence(0, greatest(size(t) - {n}, 0)),"
        f" i -> array_join(slice(t, i + 1, {n}), ' '))")
    stats = F.expr(
        f"transform(array(split(_txt, ' ')), t ->"
        f" transform(array(array_sort({grams_of_t})), g ->"
        f"  struct(size(g) as n, {walk_of_g} as w))[0])[0]")
    d = spread(docs.select(key_col, F.col(text_col).alias("_txt")))
    return (
        d.select(key_col, stats.alias("_st"))
        .select(key_col, F.col("_st.n").alias("_n"),
                F.col("_st.w").alias("_w"))
        .select(
            key_col,
            F.col("_n").cast("bigint").alias("n_grams"),
            F.col("_w.nd").cast("bigint").alias("n_distinct_grams"),
            F.col("_w.mx").cast("bigint").alias("max_gram_rep"),
            F.round(
                1 - F.col("_w.nd").cast("double")
                / F.col("_n").cast("double"), 6).alias("dup_gram_frac"),
            F.round(
                F.col("_w.mx").cast("double")
                / F.col("_n").cast("double"), 6).alias("top_gram_frac"),
            F.round(
                F.col("_w.dup").cast("double")
                / F.greatest(F.col("_w.chars"), F.lit(1)).cast("double"),
                6).alias("dup_char_frac"),
        )
    )


def chunk_tokens(docs: DataFrame, key_col: str = "doc_id",
                 text_col: str = "text", width: int = CHUNK_WIDTH,
                 stride: int = CHUNK_STRIDE) -> DataFrame:
    """1:N strided token windows: (key, chunk_idx, n_tokens, chunk_text).

    Chunk starts at token offsets 0, stride, 2*stride, ... while the
    offset is inside the document; the tail chunk may be shorter than
    ``width``. Entirely map-side (sequence + explode + slice): chunking
    100 TB is embarrassingly parallel and this plan keeps it that way.
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)),
                        F.lit(stride))
    with_toks = docs.select(
        key_col, F.col(text_col),
        F.size(toks).alias("_nt"), F.explode(starts).alias("_s"))
    toks2 = F.split(F.col(text_col), " ")
    return with_toks.select(
        key_col,
        (F.col("_s") / stride).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(width), F.col("_nt") - F.col("_s"))
        .cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", F.slice(toks2, F.col("_s") + 1, F.lit(width)))
        .alias("chunk_text"),
    )


def pii_scrub(docs: DataFrame, key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails then long digit runs; report match counts.

    (key, n_emails, n_numbers, clean_text). Emails first so the
    replacement token (no digits) can't double-count under the number
    pass. One whole-stage-codegen projection, no Python, no shuffle.
    """
    return docs.select(
        key_col,
        F.expr(f"cast(regexp_count({text_col}, '{EMAIL_RE}') as bigint)")
        .alias("n_emails"),
        F.expr(f"cast(regexp_count(regexp_replace({text_col}, '{EMAIL_RE}',"
               f" '<EMAIL>'), '{NUM_RE}') as bigint)").alias("n_numbers"),
        F.expr(f"regexp_replace(regexp_replace({text_col}, '{EMAIL_RE}',"
               f" '<EMAIL>'), '{NUM_RE}', '<NUM>')").alias("clean_text"),
    )


def sql_strat_u(key_expr: str, dialect: str = "spark",
                mod: int = 10000) -> str:
    """Deterministic uniform in [0, mod): md5-derived 60-bit hash of the
    stringified key, reduced mod ``mod``. Identical values in Spark and
    DuckDB (both hash the same decimal string)."""
    cast_t = "varchar" if dialect == "duckdb" else "string"
    return f"(({sql_hash60(f'cast({key_expr} as {cast_t})', dialect)})" \
           f" % {mod})"


def stratified_sample(docs: DataFrame, rates: DataFrame,
                      key_col: str = "doc_id",
                      source_col: str = "source",
                      mod: int = 10000) -> DataFrame:
    """Keep rows where the per-key deterministic uniform falls under the
    source's sampling threshold (`rates`: source, keep_per_10k).

    The rate table is dimension-sized — broadcast it; the filter is then
    map-side with zero shuffle of the corpus. Unsampled sources fall
    back to keeping everything (left join + coalesce), so a missing
    rate can only over-keep, never silently drop data.
    """
    u = F.expr(sql_strat_u(key_col, "spark", mod))
    return (
        docs.withColumn("strat_u", u.cast("bigint"))
        .join(F.broadcast(rates), source_col, "left")
        .withColumn("_thr", F.coalesce(F.col("keep_per_10k"), F.lit(mod)))
        .filter(F.col("strat_u") < F.col("_thr"))
        .select(key_col, source_col, "strat_u")
    )


DECON_NGRAM = 3


def decontaminate(docs: DataFrame, bench: DataFrame,
                  key_col: str = "doc_id", text_col: str = "text",
                  n: int = DECON_NGRAM) -> DataFrame:
    """Benchmark decontamination: per training document, count word
    n-grams shared with an evaluation benchmark (the n-gram-collision
    rule of Brown et al. 2020, "Language Models are Few-Shot Learners",
    App. C — public literature). Returns one row per doc:
    (key, n_hit_grams, n_distinct_hit_grams, contaminated 0/1) so the
    keep-set is a trivial downstream filter and audits can rank by
    overlap instead of hard-dropping.

    Scale shape: the benchmark side is tiny relative to the corpus
    (thousands of eval items vs 10^12 docs) — its distinct gram digests
    are BROADCAST. The corpus side explodes grams map-side, hashes each
    to a 32-hex md5 (gram text never shuffles), hash-joins against the
    broadcast set map-side, and partial-aggregates per doc; the only
    corpus-wide shuffle carries (key, digest) rows for HITS only, which
    decontamination makes rare by construction. The final left join
    back to the doc list keys on ``key_col`` and carries two ints.
    """
    bench_grams = (
        bench.select(F.explode(_grams(text_col, n)).alias("g"))
        .select(F.md5("g").alias("gh")).distinct()
    )
    doc_grams = (
        docs.select(key_col, F.explode(_grams(text_col, n)).alias("g"))
        .select(key_col, F.md5("g").alias("gh"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"),
             F.countDistinct("gh").alias("n_distinct_hit_grams"))
    )
    return (
        docs.select(key_col).join(hits, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint")
            .alias("n_hit_grams"),
            F.coalesce("n_distinct_hit_grams", F.lit(0)).cast("bigint")
            .alias("n_distinct_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).cast("int")
            .alias("contaminated"),
        )
    )


def lm_score(docs: DataFrame, key_col: str = "doc_id",
             text_col: str = "text",
             broadcast_model: bool = True) -> DataFrame:
    """Unigram language-model quality score per document (the LM-filter
    stage of CCNet, Wenzek et al. 2020 — public literature — with a
    unigram model in place of a trained KenLM): per doc,
    (n_tokens, logprob_sum, logprob_per_token) under token frequencies
    estimated from the corpus itself. Low per-token log-probability
    flags gibberish / non-language documents; high flags boilerplate.

    Scale shape: the model is a token -> document-frequency table —
    one corpus shuffle bounded by VOCABULARY size after map-side
    partial aggregation, then broadcast back (a natural-language vocab
    is dimension-sized at any corpus scale; at 100 TB persist the
    model once and reuse it instead of recomputing per run). Scoring
    is a map-side broadcast join + one per-doc partial-agg shuffle
    carrying (key, count, double). Unseen tokens (external-model use)
    fall back to a 0.5 pseudo-count. Sums are rounded to 6 decimals so
    the score is reproducible across engines and summation orders.

    ``broadcast_model``: a CURATED natural-language vocab is
    dimension-sized, but the raw token vocabulary of web text is NOT
    bounded (URLs, typos, hashes make the tail grow with the corpus) —
    at 100 TB either pre-prune the model to a curated vocab before
    broadcasting, or pass ``broadcast_model=False`` to use a plain
    token-keyed shuffle join (AQE sizes it; results identical — the
    flag changes only the physical join).
    """
    toks = docs.select(
        key_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    model = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    lp = F.log(F.coalesce(F.col("df").cast("double"), F.lit(0.5))
               / F.col("n_total"))
    return (
        toks.join(F.broadcast(model) if broadcast_model else model,
                  "tok", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.sum(lp), 6).alias("logprob_sum"),
            F.round(F.sum(lp) / F.count(F.lit(1)), 6)
            .alias("logprob_per_token"),
        )
    )


VOCAB_K = 100


def vocab_topk(docs: DataFrame, text_col: str = "text",
               k: int = VOCAB_K) -> DataFrame:
    """Corpus term-frequency top-k: (tok, n, rank) for the ``k`` most
    frequent whitespace tokens, ties broken by token text — the vocab
    scan every tokenizer-training / corpus-audit pass starts with.

    Scale shape: explode map-side, one shuffle bounded by VOCABULARY
    size after map-side partial aggregation (word frequencies follow
    Zipf — the reduce side is dimension-sized no matter the corpus),
    then Spark's TakeOrderedAndProject for the top-k: per-partition
    heaps of k rows, never a global sort. The rank window runs on the
    k-row result, not the corpus.
    """
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql import Window
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return top.select(
        "tok", "n",
        F.row_number().over(w).cast("bigint").alias("rank"))


def winnow_fingerprints(docs: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003 — the
    MOSS local-fingerprinting algorithm): from each window of ``w``
    consecutive k-gram hashes keep the minimum (rightmost on ties);
    the distinct selected (position, hash) pairs are the document's
    fingerprint set. Guarantees a fingerprint in every w-gram window
    (detection threshold t = w + k - 1 tokens) at ~2/(w+1) density —
    the standard sketch for plagiarism / near-dup detection at corpus
    scale.

    Spark shape (round 6): the whole selection is a pure function of
    ONE document, so it runs with ZERO exchanges — gram md5s, the
    rightmost-minimum rule (string min over ``md5hex || zero-padded
    inverted position``: string min == (hash asc, position desc), the
    exact tie-break) and the per-doc distinct all happen inside the
    token array (``transform`` + ``array_min`` over each w-slice +
    ``array_distinct``), then one explode emits the fingerprints.
    The previous form shuffled every gram into a per-doc position
    window whose reduce side AQE coalesced to 2 tasks (32.4 s at sf1);
    this one stays in the scan stage at any scale.

    Returns (key, fp_pos int, fp_hash string) distinct fingerprints.
    """
    # Intermediates (token array, sel-string array) are let-bound as
    # lambda variables via transform(array(x), v -> ...)[0]: Catalyst's
    # CollapseProject otherwise INLINES a projected array into every
    # use site inside downstream HOF lambdas, re-running split() per
    # gram and the whole sel build per window — O(grams^2) per doc
    # (observed: one task pinned for 14 min at sf1 before this guard).
    # sel string per gram position: md5 || inverted zero-padded pos;
    # guard short docs: sequence(0, size-k) DESCENDS when size < k (the
    # repo's twice-encountered Spark gotcha — see line_dedup).
    sels_of_t = (
        f"transform(sequence(0, size(t) - {k}),"
        f" p -> md5(array_join(slice(t, p + 1, {k}), ' '))"
        f" || lpad(cast(999999999 - p as string), 9, '0'))")
    # window ending at position p exists for p in [w-1, n); its min is
    # over sels[p-w+1 .. p] (0-based) == slice(ss, p-w+2, w) (1-based)
    fps_of_ss = (
        f"case when size(ss) >= {w} then"
        f" array_distinct(transform(sequence({w - 1}, size(ss) - 1),"
        f" p -> array_min(slice(ss, p - {w - 2}, {w}))))"
        f" else cast(array() as array<string>) end")
    fps = spread(docs.select(
        F.col(key_col).alias("key"), F.col(text_col).alias("_txt"))
    ).select(
        "key",
        F.expr(
            f"transform(array(split(_txt, ' ')), t ->"
            f" case when size(t) >= {k} then"
            f"  transform(array({sels_of_t}), ss -> {fps_of_ss})[0]"
            f" else cast(array() as array<string>) end)[0]"
        ).alias("fps"))
    # explode_outer, NOT explode: InferFiltersFromGenerate would infer
    # size(fps) > 0 AND isnotnull(fps) for a plain explode and push it
    # below the projection, inlining (= recomputing) the whole array
    # twice; the outer variant infers nothing, and the cheap null
    # filter on the GENERATED attribute removes short docs' null row
    picked = (fps.select("key", F.explode_outer("fps").alias("winmin"))
              .filter(F.col("winmin").isNotNull())
              .select(
                  "key",
                  (F.lit(999_999_999)
                   - F.substring("winmin", 33, 9).cast("int"))
                  .alias("fp_pos"),
                  F.substring("winmin", 1, 32).alias("fp_hash")))
    return picked.withColumnRenamed("key", key_col)


def sql_winnow(table: str = "documents", key_col: str = "doc_id",
               text_col: str = "text", k: int = 5, w: int = 4) -> str:
    """The identical selection as DuckDB SQL (oracle half)."""
    return f"""
WITH toks AS (
  SELECT {key_col} AS key, string_split({text_col}, ' ') AS t
  FROM {table}
), grams AS (
  SELECT key, p.pos AS pos, p.gh AS gh
  FROM toks, unnest([{{'pos': x - 1,
        'gh': md5(array_to_string(t[x : x + {k} - 1], ' '))}}
        for x in range(1, len(t) - {k} + 2)]) AS u(p)
), keyed AS (
  SELECT key, pos, gh,
         gh || lpad(cast(999999999 - pos as varchar), 9, '0') AS sel,
         row_number() OVER (PARTITION BY key ORDER BY pos) AS rn,
         min(gh || lpad(cast(999999999 - pos as varchar), 9, '0'))
             OVER (PARTITION BY key ORDER BY pos
                   ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)
           AS winmin
  FROM grams
)
SELECT DISTINCT key AS {key_col},
       cast(999999999 - cast(substring(winmin, 33, 9) as bigint)
            as integer) AS fp_pos,
       substring(winmin, 1, 32) AS fp_hash
FROM keyed WHERE rn >= {w}
"""
