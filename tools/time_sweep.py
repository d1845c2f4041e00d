#!/usr/bin/env python
"""Engine-only timing sweep: one cold noop-write of every registered id.

This is the pathology hunter, not a benchmark — bench.py owns medians
and baselines. One pass over the full registry at --sf surfaces
order-of-magnitude outliers the differential sweep can't see (it checks
values, not plans): round 6 this caught llm_ngram_novelty running its
gram expression inside the single-file scan task (33.6 s, a plain
explode's inferred filter pushed below the spread exchange — 25x after
the fix). Timings are cold single runs; read them for outliers (>5-10x
their family's band), not for regressions in the noise band.

Usage: python tools/time_sweep.py [--sf /root/testdata/sf0.1] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Multi-trigger streaming demo — minutes by design, exercised in pytest.
SKIP = {"stream_output_modes"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.sources.session import get_spark

    engine.load_all()
    reg = engine.all_queries()
    spark = get_spark("time_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # Absorb session cold-start (JIT, codegen, first-scan file listing)
    # BEFORE the loop: without this the alphabetically-first id eats it
    # and tops every sweep (agg_abc_analysis read 15.1 s cold vs 0.70 s
    # in-session, r7 — pure startup, rediscovered each round).
    from big_data_management_and_analytics_spark.sources.io import load

    load(spark, args.sf, "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    rows: list[tuple[float, str]] = []
    errors = 0
    for name in sorted(reg):
        if name in SKIP:
            continue
        t0 = time.perf_counter()
        try:
            reg[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            rows.append((time.perf_counter() - t0, name))
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {name}: {exc}", flush=True)
            errors += 1
    rows.sort(reverse=True)
    print(f"\nslowest {args.top} of {len(rows)} ids at {args.sf} (cold, 1 run):")
    for t, name in rows[: args.top]:
        print(f"{t:8.2f}  {name}")
    print(f"\n{len(rows)} timed, {errors} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
