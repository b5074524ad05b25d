"""Per-query isolation bench (round 6 optimization work).

bench.py is FROZEN for measurement (driver contract); this sidecar
times individual declared queries through the same noop-sink
methodology (guide §1.4) and captures .explain("formatted") plans so
before/after evidence can be committed under plans/r06/.

Usage:
  python bench_extra.py [-n N] [--sf-dir DIR] [--plans DIR] [--tag TAG] q1 q2 ...
  python bench_extra.py --all            # every HEADLINE query

Prints one line per query:  name  best_sec  [all samples]
and a final JSON line {"queries": {...}, "sf_dir": ...} for records.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
import bench as benchmod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus",
                    default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    names = benchmod.HEADLINE if args.all else args.names
    spark = benchmod._session(f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = fn(spark, args.sf_dir)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans,
                                   f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            benchmod._force(fn(spark, args.sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = min(samples)
        print(f"{name:28s} {min(samples):8.3f}  {samples}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out, "sf_dir": args.sf_dir,
                      "n": args.n}))
    spark.stop()


if __name__ == "__main__":
    main()
