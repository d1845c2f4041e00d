#!/usr/bin/env python
"""Simulate the driver's per-round correctness queue.

The driver verifies the first ~CAP ids yielded by __spark_entry__.queries()
each round. This prints the next round's prefix, how many slots would be
wasted on already-verified ids (should be 0), and the projected number of
rounds until the whole registry is driver-green.

Usage: python tools/queue_sim.py [--cap 50]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as entry
    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.plans.driver_history import (
        driver_history,
        driver_rounds,
        queue_order,
    )

    engine.load_all()
    reg = engine.all_queries()
    sids = entry._survey_ids()
    rounds = driver_rounds()
    hash_green, any_green = driver_history(rounds=rounds)
    latest_hash, latest_any = rounds
    order = queue_order(reg, sids)

    def tier_done(n: str) -> bool:
        return n in (hash_green if reg[n].oracle else any_green)

    def tier_round(n: str) -> int:
        return (latest_hash if reg[n].oracle else latest_any).get(n, 0)

    prefix = order[: args.cap]
    wasted = [n for n in prefix if tier_done(n)]
    remaining = [n for n in order if not tier_done(n)]
    print(f"registry: {len(reg)} ids "
          f"({sum(1 for q in reg.values() if q.oracle)} oracle-tier)")
    print(f"driver-green so far: {len(any_green)} ({len(hash_green)} hash)")
    print(f"tier-unverified remaining: {len(remaining)}")
    if args.cap > 0:
        nrounds = -(-len(remaining) // args.cap)
        print(f"projected rounds to full green at cap {args.cap}: {nrounds}")
    if remaining:
        print(f"next-round prefix ({args.cap} slots, {len(wasted)} wasted):")
    elif prefix:  # ADVICE r10: --cap 0 / empty registry must not IndexError
        # Post-drain: every slot re-verifies; the prefix refreshes the
        # stalest driver rows (oldest latest-green round first), so a
        # full staleness cycle takes ceil(registry/cap) rounds.
        ages = sorted(tier_round(n) for n in prefix)
        print(
            f"post-drain staleness rotation: prefix refreshes rounds "
            f"r{ages[0]:02d}..r{ages[-1]:02d}; full cycle = "
            f"{-(-len(reg) // args.cap)} rounds"
        )
        print(f"next-round prefix ({args.cap} slots, all re-verification):")
    else:
        print(f"next-round prefix ({args.cap} slots):")
    for n in prefix:
        tag = "§2" if n in sids else "  "
        print(f"  {tag} {'oracle' if reg[n].oracle else 'rows  '} "
              f"r{tier_round(n):02d} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
