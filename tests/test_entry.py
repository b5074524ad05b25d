"""Driver-contract smoke: entry() runs, queries()/oracle_sql() coherent."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"polygon_id", "zone", "n_pages"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the large majority of operators must be oracle-checked; only
    # genuinely non-SQL-expressible ops (pandas-UDF decode/polygonize,
    # LSH candidate generation, approximate kNN) may be rows-only
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "ann_lsh", "ann_ivf",
        "outline_components", "decode_images", "frame_sample",
    }


def test_all_queries_run_and_nonempty(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_driver_checked_prefix_covers_distinct_operators():
    """The external driver evaluates only the FIRST 50 queries()
    entries (registration order). Guard the prefix composition: every
    operator family's distinct rules — and especially operators new
    this round — must sit inside the checked window, and the window
    must be exactly the documented 50 wide before the tail comment."""
    import __spark_entry__ as m
    names = list(m.queries().keys())
    prefix = set(names[:50])
    must_be_checked = {
        # round-5 rotation: decode_gif and decode_audio were never
        # driver-checked in r1-r4 (VERDICT r4 item 1); minhash_sigs
        # moved to the tail (its signature stage is embedded in the
        # checked minhash_candidates pipeline), and decode_video
        # (r4-green, same grouped-decode rule) yielded its slot to
        # extract_text, which pins BASELINE.json's
        # byte-identical-text-per-url invariant
        "decode_gif", "decode_audio", "extract_text",
        # round-5b rotation: every operator added in round 5 that had
        # never seen a driver row (decode_jpeg yielded its slot — the
        # grouped Arrow decode rule stays checked three ways via
        # decode_gif/decode_audio/decode_geotiff)
        "asof_join", "geoparse_pip", "decode_geotiff", "warc_parse",
        "scd2_history", "bloom_join", "stream_sessions", "image_dhash",
        "winnow", "kmv_distinct", "bm25", "postings",
        # round-5b second wave: four more never-checked operators in
        # for second/third family representatives (simhash, ann_lsh,
        # reproject_lcc, shuffle_rank -> tail, all r4-green + diffcheck)
        "robots_gate", "geotiff_pipeline", "merge_upsert",
        "jsonl_source",
        # round-4 additions
        "substr_dedup", "bpe_merges", "flagship_stream",
        "pagerank", "streaming_dedup",
        # one representative per long-standing family
        "pip_count", "pip_general", "knn", "zonal_stats", "hillshade",
        "outline_components", "minhash_candidates",
        "ngram_jaccard", "embedding_near_dup", "ann_cosine", "ann_ivf",
        "reproject_utm", "metadata_map",
        "dedup_canonical", "decontaminate", "vocab_topk",
        "pack_sequences", "sessionize",
        "stratified_sample", "chunk_tokens",
        "repetition_signals", "text_quality",
        # round-5c rotation: three NEW operators (curve-order index,
        # datum transform, register sketch) in for pii_scrub /
        # line_dedup / source_cap, whose families keep 5+, 5 and 2
        # prefix representatives respectively
        "hilbert_cells", "datum_shift", "hll_distinct",
        # plus weighted_sample (A-ES) for lm_score (textprep keeps
        # decontaminate — the same broadcast-gram shape — and three more)
        "weighted_sample",
    }
    missing = must_be_checked - prefix
    assert not missing, f"rotated out of the driver-checked 50: {missing}"
    oracles = m.oracle_sql()
    assert all(n in oracles for n in names), "every query needs an oracle"
