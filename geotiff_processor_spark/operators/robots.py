"""robots.txt policy: parse crawl-policy text and gate fetches.

The governance stage every crawl pipeline runs before a byte is
fetched: per-host robots.txt text -> (host, disallowed path prefixes)
-> prefix-match against each page URL. The reference's analog is its
per-directory skip list (process.py subdir skip); here the skip rule
arrives as TEXT and must be parsed.

Scale shape: the policy table is per-HOST (tiny next to the page
table) — rules parse with native string ops (split/explode/trim, no
UDF), aggregate to ONE array row per host, and BROADCAST; the page
side is ONE broadcast join plus an ``exists(prefixes, startswith)``
lambda in codegen — the fetch table never shuffles and never fans out
(no per-rule row explosion on the big side).

Parsed subset (the part with unambiguous standard semantics): global
``Disallow:`` lines; an empty Disallow value means allow-all (dropped);
comments (#) and blank lines skipped. Host/path come from one shared
regex (no parse_url — the same text runs in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SQL_URL_HOST = "regexp_extract({u}, '^[a-z]+://([^/]+)', 1)"
SQL_URL_PATH = "regexp_extract({u}, '^[a-z]+://[^/]+(/.*)$', 1)"


def sql_robots_text(k: str) -> str:
    """Synthetic per-host policy text from an integer site id — ONE
    formula for both engines (chr(10) newlines: '\\n' escapes diverge
    between Spark and DuckDB string literals). Exercises every parser
    branch: comment lines, case-insensitive directive match
    (DISALLOW:), case-SENSITIVE path prefixes (/P/ must not match
    /p/...), and the empty allow-all Disallow."""
    nl = "chr(10)"
    return (
        f"'# crawl policy' || {nl} || 'User-agent: *' || {nl}"
        f" || CASE WHEN {k} % 5 = 0 THEN 'Disallow: /p/' || {nl}"
        f"         ELSE '' END"
        f" || CASE WHEN {k} % 7 = 0 THEN 'Disallow: /admin' || {nl}"
        f"         ELSE '' END"
        f" || CASE WHEN {k} % 11 = 0 THEN 'DISALLOW: /q' || {nl}"
        f"         ELSE '' END"
        f" || CASE WHEN {k} % 13 = 0 THEN 'Disallow: /P/' || {nl}"
        f"         ELSE '' END"
        f" || 'Disallow:' || {nl} || '# end'"
    )


def parse_robots(policies: DataFrame, host_col: str = "host",
                 text_col: str = "robots") -> DataFrame:
    """(host, rules array<string>): the non-empty Disallow prefixes of
    each host's policy text, sorted for determinism.

    Native pipeline: split to lines -> trim -> drop comments/blanks ->
    keep ``Disallow:`` lines -> extract + trim the prefix -> drop
    empties (empty Disallow = allow-all per the standard)."""
    line = F.explode(F.split(F.col(text_col), "\n")).alias("line")
    lines = policies.select(host_col, line).select(
        host_col, F.trim(F.col("line")).alias("line"))
    return (
        lines
        .filter(~F.col("line").startswith("#"))
        .filter(F.lower(F.col("line")).startswith("disallow:"))
        .select(host_col,
                F.trim(F.expr("substring(line, 10)")).alias("rule"))
        .filter(F.col("rule") != "")
        .groupBy(host_col)
        .agg(F.array_sort(F.collect_list("rule")).alias("rules"))
    )


def robots_gate(pages: DataFrame, policies: DataFrame,
                url_col: str = "url", host_col: str = "host",
                text_col: str = "robots") -> DataFrame:
    """Pages + a ``blocked`` flag: true iff any parsed Disallow prefix
    of the page's host matches the URL path. The parsed per-host rule
    arrays broadcast; hosts with no rules (or no policy row) default
    to allowed, exactly like a missing robots.txt."""
    rules = parse_robots(policies, host_col, text_col)
    keyed = pages.withColumn(
        "_host", F.expr(SQL_URL_HOST.format(u=url_col))).withColumn(
        "_path", F.expr(SQL_URL_PATH.format(u=url_col)))
    joined = keyed.join(F.broadcast(rules),
                        keyed["_host"] == rules[host_col], "left")
    blocked = F.when(
        F.col("rules").isNotNull(),
        F.exists("rules", lambda r: F.col("_path").startswith(r)),
    ).otherwise(F.lit(False))
    return joined.select(*[keyed[c] for c in pages.columns],
                         blocked.alias("blocked"))
