"""Probe-gated quiet-window re-time of named headline queries.

VERDICT r4 flagged five headline readings that inflated >= 1.6x
between r3 and r4 inside a slower window grant (decode_images,
ann_cosine, cell_encode, minhash_sigs, simhash) and asked for an
in-session quiet-window re-time. This reuses bench.py's
engine-independent window gate (hypervisor steal + pure-CPU machine
probe) and timing discipline (one warm run, min of N timed runs),
then prints one JSON line for BASELINE.md.

Usage: python scripts/retime.py [query ...]   (defaults to the five)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = ["decode_images", "ann_cosine", "cell_encode",
           "minhash_sigs", "simhash"]


def main() -> None:
    import bench

    names = sys.argv[1:] or DEFAULT
    # bounded wait for a window the machine itself demonstrably scales in
    deadline = time.time() + 1800
    steal = p8 = p32 = 0.0
    good = False
    while time.time() < deadline:
        steal, p8, p32 = bench._window_quality()
        good = bench._window_good(steal, p8, p32,
                                  steal_clean=0.02, probe_gate=3.3)
        print(f"window: steal={steal:.4f} probe8={p8:.0f}"
              f" probe32={p32:.0f} ratio={p32 / max(p8, 1e-9):.2f}"
              f" good={good}", file=sys.stderr)
        if good:
            break
        time.sleep(20)

    spark = bench._session("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    sf_dir = "/root/testdata/sf0.1"
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm
        best = min(
            _timed(fn, spark, sf_dir) for _ in range(3))
        out[name] = round(best, 3)
    steal2, _, _ = bench._window_quality()
    print(json.dumps({"retime": out, "sf": 0.1,
                      "window_good": good,
                      "steal_before": round(steal, 4),
                      "steal_after": round(steal2, 4),
                      "probe_ratio": round(p32 / max(p8, 1e-9), 2)}))


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
