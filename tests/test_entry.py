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
