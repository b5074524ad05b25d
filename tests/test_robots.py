"""robots.txt gate (operators/robots.py): parser branches, prefix
semantics, missing-policy default, and the broadcast no-shuffle plan."""

import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import robots


def _pol(spark, text):
    return spark.createDataFrame([("a.example", text)],
                                 "host string, robots string")


def test_parser_branches(spark):
    text = ("# comment\nUser-agent: *\nDisallow: /p/\n"
            "DISALLOW: /q\nDisallow: /P/\nDisallow:\n# end")
    rules = robots.parse_robots(_pol(spark, text)).collect()
    assert len(rules) == 1
    assert sorted(rules[0]["rules"]) == ["/P/", "/p/", "/q"]


def test_gate_prefix_semantics(spark):
    pages = spark.createDataFrame(
        [("https://a.example/p/1",),     # blocked: /p/ prefix
         ("https://a.example/P/1",),     # blocked: /P/ rule (exact case)
         ("https://a.example/page",),    # NOT blocked: /p/ != /pa...
         ("https://a.example/q2",),      # blocked: /q prefix
         ("https://b.example/p/1",)],    # no policy -> allowed
        "url string")
    text = "Disallow: /p/\nDISALLOW: /q\nDisallow: /P/"
    out = {r["url"]: r["blocked"] for r in
           robots.robots_gate(pages, _pol(spark, text)).collect()}
    assert out == {
        "https://a.example/p/1": True,
        "https://a.example/P/1": True,
        "https://a.example/page": False,
        "https://a.example/q2": True,
        "https://b.example/p/1": False,
    }


def test_plan_pages_never_shuffle(spark):
    pages = spark.createDataFrame([("https://a.example/p/1",)],
                                  "url string")
    df = robots.robots_gate(pages, _pol(spark, "Disallow: /p/"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the single hash exchange is the tiny per-host rule aggregation
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    probe_side = plan.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in probe_side
