"""Opportunistic scaling-attempt runner.

Runs ONE pinned local[8]-vs-local[32] flagship scaling attempt using
exactly bench.py's protocol (same window gates, same pinned subprocess
pair, same record format) and appends the result to
``scaling_attempts.jsonl`` at the repo root.

Run repeatedly during a build round (e.g. from a loop) to hunt for a
clean host window; ``bench.py`` then reports the best clean-window
attempt for the current code (code-hash-checked) when its own live
deadline can't catch one. The stopping/gating criteria never look at
the engine's measured efficiency, so the hunt cannot bias the number —
it only decides WHEN the measurement is taken.

Usage: python scripts/scaling_attempt.py [window_budget_s] [job]
       job: flagship (default) | shuffle (ExactSubstr dedup — the
       shuffle-heavy second scaling block, bench.shuffle_pipeline)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_REPL,
       SPARK_GRAFT_BENCH_DOCS_REPL as in bench.py.
Exit:  0 clean attempt recorded, 2 attempt ran but window not clean,
       3 skipped (window never went good within budget).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0
    job = sys.argv[2] if len(sys.argv) > 2 else "flagship"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # the busy check must PRECEDE input materialization: the one-time
    # local[32] materialize is itself a heavy run and would contaminate
    # whatever with_busy-serialized measurement is in flight
    busy_dir = "/tmp/builder_busy.d"
    if os.path.exists("/tmp/builder_busy") or (
            os.path.isdir(busy_dir) and any(
                os.path.exists(f"/proc/{m}")
                for m in os.listdir(busy_dir))):
        print(json.dumps({"skipped": True,
                          "skip_reason": "builder busy marker live"}))
        return 3
    if job == "shuffle":
        repl = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS_REPL", "32"))
        pages_path = f"/tmp/bench_docs_sf{sf}_x{repl}.parquet"
        if not os.path.exists(pages_path):
            s = bench._session("local[32]")
            s.sparkContext.setLogLevel("ERROR")
            bench.materialize_docs(s, sf_dir, repl, pages_path)
            s.stop()
    else:
        repl = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "256"))
        pages_path = f"/tmp/bench_pages_sf{sf}_x{repl}.parquet"
        if not os.path.exists(pages_path):
            s = bench._session("local[32]")
            s.sparkContext.setLogLevel("ERROR")
            bench.materialize_pages(s, sf_dir, repl, pages_path)
            s.stop()

    # closes the race where the hunt's marker check passed an instant
    # before a bench run (driver's or builder's) marked itself busy:
    # never START an attempt while any builder/bench marker is live
    busy_dir = "/tmp/builder_busy.d"
    if os.path.exists("/tmp/builder_busy") or (
            os.path.isdir(busy_dir) and any(
                os.path.exists(f"/proc/{m}")
                for m in os.listdir(busy_dir))):
        print(json.dumps({"skipped": True,
                          "skip_reason": "builder busy marker live"}))
        return 3

    entry = bench.run_single_attempt(pages_path, window_budget_s=budget,
                                     skip_if_bad=True, job=job)
    entry["source"] = "scaling_attempt"
    bench._record_attempt(entry)
    print(json.dumps(entry))
    if entry.get("skipped"):
        return 3
    return 0 if entry.get("clean") else 2


if __name__ == "__main__":
    sys.exit(main())
