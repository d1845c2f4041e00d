"""Benchmark runner (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Protocol per
BASELINE.md: one warm-up run, then median of 3 timed runs on a warm
session; `value` is the sum of per-query medians over the HEADLINE
(scale-path) suite only.

Round-2 verdict items 7-8:
- Declared exact baselines (O(n²) by design) time separately under
  `exact_baselines` so a regression in a scalable operator is never
  masked by the baseline's dominance of the total.
- Every headline query also runs at a second scale point
  ($SPARK_GRAFT_SF_SMALL_DIR, default sf0.01) and the output carries
  `queries_sf_small` + per-query `scaling_x` (time ratio across the 10×
  data step) so super-linear growth is visible per query, not hidden in
  a single-sf snapshot.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_pushdown_filter",   # scan + pushdown
    "agg_pricing_summary",    # flagship hash agg
    "join_star_5way",         # fact-fact + broadcast dims
    "win_topk_per_group",     # window family
    "win_running_sum",        # window family (frames)
    "stream_tumbling_batch",  # time-window agg
    "llm_text_tfidf",         # text pipeline (explode + joins + window)
    "llm_sim_knn",            # vector search brute-force
    "llm_dedup_minhash",      # scalable near-dup (signatures + banding)
    "llm_dedup_substring",    # exact substring-span dedup (hashed k-grams)
    "tpch_q3_shipping",       # composite pipeline: 3-way join + top-k
    "tpch_q18_bigorders",     # composite pipeline: pre-agg + HAVING + dims
    "llm_dedup_components",   # iterative min-label propagation (cache loop)
    "llm_embed_pca",          # Arrow partial-covariance + driver eigensolve
    "tpch_q9_profit",         # 5-way join, 3 broadcast dims, nation-year agg
    "tpch_q21_waiting",       # decorrelated EXISTS pair (per-order agg reuse)
    "llm_contamination_bloom",# bloom build + codegen probe (100 TB plan form)
    "llm_dedup_ssjoin",       # exact prefix-filtered similarity join (output-bound)
    "agg_abc_analysis",       # two-pass global prefix sum + integer thresholds
    "mm_phash_neardup",       # image aHash + hamming-band LSH (multimodal dedup)
    "llm_embed_pq",           # relational product-quantization trainer (r4)
    "llm_bm25_search",        # BM25 lexical retrieval over posting lists (r4)
    "mkt_item_similarity",    # item-item CF cosine top-5 (per-basket pairs) (r4)
    "llm_hybrid_rrf",         # BM25 + PRF-dense reciprocal-rank fusion (r4)
    "graph_label_propagation",# bipartite LPA communities, 3 half-steps (r4)
    "ts_holt_winters",        # seasonal triple-EWMA fold, gap-filled spine (r4)
]

# Declared exact small-scale baselines — O(n²) pair space BY DESIGN (the
# scalable siblings are in HEADLINE). Timed, reported, not summed into
# `value`.
EXACT_BASELINES = [
    "llm_dedup_near_exact",   # exact all-pairs Jaccard (parallelized BNLJ)
]

RUNS = 3

# Round-5 verdict item 3: wait for a quiet machine before timing. SCALE.md
# documents 25-100% per-query swings with external load (r3 bloom 6.0 s
# incident; r5 load 2.6->8.6 made two queries look regressed). Poll the
# 1-minute load average until it drops below the threshold, bounded so a
# permanently-busy host still produces an artifact (with the load recorded).
# Threshold history: 2.0 -> 1.0 (r6: a run started at load 1.93 still read
# llm_dedup_minhash 35% above its quiet value) -> 0.3 (r8: the r7 driver
# run started at 0.80 — UNDER the old gate — and still read minhash
# 1.274 s vs the 0.984 s quiet floor, +29%; a start load well below one
# busy core is required before per-query readings match the committed
# quiet artifact). Worst-case extra wait stays bounded at
# QUIET_RETRIES x QUIET_WAIT_S = 10 min.
QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "0.3"))
# The 1m average alone is NOT a sufficient quiet signal: an r8 run
# started at 1m=0.08 immediately after a 3h sweep marathon (5m=2.7,
# 15m=4.5 — runqueue drained, machine not settled) and read minhash
# 1.258 s vs the 0.984 s quiet floor, the same +28% the loaded driver
# runs show. Gate the 5m average too; it decays with a 5-minute time
# constant, so the 10-min wait bound still clears a just-finished
# burst (2.7 -> ~0.4). Threshold history: 1.0 (r8) -> 0.7 (r11: two r10
# attempts passed the gate at 5m = 0.93-0.99 during residual-load decay
# and were discarded for early-window contamination — VERDICT r10
# item 2).
QUIET_LOAD_5M = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD_5M", "0.7"))
QUIET_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUIET_RETRIES", "20"))
QUIET_WAIT_S = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "30"))
# Decay-awareness (VERDICT r10 item 2): a threshold snapshot alone can
# pass while load is still settling OR freshly spiking. Require
# QUIET_CONSECUTIVE consecutive polls that each clear the thresholds
# with the 1m at/below the 5m average (load decaying or flat). The
# tolerance absorbs idle loadavg jitter (a 0.03-0.05 1m blip over a
# 0.00 5m is noise, not a spike). Worst-case wait stays bounded at
# QUIET_RETRIES x QUIET_WAIT_S = 10 min; a clean start now costs one
# extra 30 s confirmation poll.
QUIET_CONSECUTIVE = int(
    os.environ.get("SPARK_GRAFT_BENCH_QUIET_CONSECUTIVE", "2")
)
QUIET_TREND_TOL = float(
    os.environ.get("SPARK_GRAFT_BENCH_QUIET_TREND_TOL", "0.05")
)


def _load_avg() -> tuple[float, float] | None:
    try:
        l1, l5, _ = os.getloadavg()
        return round(l1, 2), round(l5, 2)
    except OSError:
        return None


def _wait_for_quiet() -> tuple[float, float] | None:
    """Block until QUIET_CONSECUTIVE consecutive polls each read 1m load
    < QUIET_LOAD AND 5m load < QUIET_LOAD_5M AND 1m <= 5m +
    QUIET_TREND_TOL (decaying or flat, not freshly spiking), or retries
    are exhausted; return the final (1m, 5m) readings (BOTH are recorded
    in the artifact — a retries-exhausted run must be triageable
    post-hoc for the 'runqueue drained, machine not settled' state the
    5m gate exists to catch)."""
    load = _load_avg()
    streak = 0
    for _ in range(QUIET_RETRIES):
        if load is None:
            break
        quiet = (
            load[0] < QUIET_LOAD
            and load[1] < QUIET_LOAD_5M
            and load[0] <= load[1] + QUIET_TREND_TOL
        )
        streak = streak + 1 if quiet else 0
        if streak >= QUIET_CONSECUTIVE:
            break
        why = (
            f"confirming quiet ({streak}/{QUIET_CONSECUTIVE})"
            if quiet
            else f"above quiet gate ({QUIET_LOAD}/{QUIET_LOAD_5M}, "
            f"trend tol {QUIET_TREND_TOL})"
        )
        print(
            f"bench: load_avg 1m={load[0]} 5m={load[1]} {why}, "
            f"waiting {QUIET_WAIT_S:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(QUIET_WAIT_S)
        load = _load_avg()
    return load


def _calibrate() -> dict[str, float]:
    """Fixed-work CPU spin, single-thread and all-cores, timed — a
    machine-speed constant recorded in the artifact. Motivation (r8):
    three same-tree runs at start load 0.03-0.08 read the suite 31.2,
    32.5 and 45.5 s — the guest load average cannot see HOST-side
    contention on a shared hypervisor, so a per-run calibration burst
    is the only way to tell 'this run was slow' from 'this machine was
    slow'. Compare suite readings across rounds only at comparable
    calib values."""
    import concurrent.futures as cf

    def spin(n: int) -> int:
        acc = 0
        for i in range(n):
            acc = (acc * 1103515245 + 12345 + i) % 2147483647
        return acc

    n = 20_000_000
    t0 = time.perf_counter()
    spin(n)
    t1 = time.perf_counter()
    ncpu = os.cpu_count() or 1
    with cf.ThreadPoolExecutor(max_workers=ncpu) as ex:
        # Threads contend on the GIL for pure-Python work; use processes?
        # No: the goal is wall-clock of a fixed burst under whatever the
        # host gives us, and a GIL-serialized N*spin is exactly N x the
        # single-thread work pushed through one core while the OTHER
        # cores stay idle — wrong shape. Use a C-level spin instead:
        # hashlib releases the GIL for large buffers.
        import hashlib

        buf = b"\0" * (1 << 22)

        def chew() -> bytes:
            h = hashlib.sha256()
            for _ in range(32):
                h.update(buf)
            return h.digest()

        t2 = time.perf_counter()
        list(ex.map(lambda _: chew(), range(ncpu)))
        t3 = time.perf_counter()
    return {
        "calib_spin_1t_s": round(t1 - t0, 3),
        "calib_sha_allcores_s": round(t3 - t2, 3),
    }


# Degraded-host gate on the calibration burst (r8 verdict item 3): the
# guest load average CANNOT see host-side hypervisor contention — the
# graded BENCH_r08 run started at loadavg 0.15, passed the quiet gate,
# and still ran on a host ~4× degraded on all-core throughput
# (calib_sha 0.657 vs the ~0.15-0.16 idle reference), recording the
# first 2× baseline breach in the project's history. So gate on the
# burst itself: retry while calib_sha_allcores_s exceeds the BASELINE.md
# r8-addendum triage threshold (0.18 s), bounded like the quiet-load
# gate; if the host never clears, publish anyway but stamp
# `degraded_host: true` so the artifact self-declares instead of
# silently grading a slow machine as a slow plan.
CALIB_SHA_DEGRADED = float(
    os.environ.get("SPARK_GRAFT_BENCH_CALIB_SHA_MAX", "0.18")
)
# Single-thread degradation is a SEPARATE host mode from all-core
# contention (measured r9: a day with calib_sha inside the idle band
# read calib_spin 3.3-3.8 vs the 2.9-3.1 idle reference — ~12% slow on
# every JIT/driver-side serial phase while parallel throughput looked
# clean). The r8 breach run read spin 3.828; gate both modes.
CALIB_SPIN_DEGRADED = float(
    os.environ.get("SPARK_GRAFT_BENCH_CALIB_SPIN_MAX", "3.5")
)
# 10 × 30 s = 5 min bound (vs the quiet gate's 10): the measured host
# degradation states are day-scale (BASELINE.md r8 addendum), so a
# longer poll rarely clears — stamping degraded_host sooner keeps the
# worst-case pre-run delay (quiet gate + calib gate) at 15 min, safely
# inside any reasonable caller timeout.
CALIB_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_CALIB_RETRIES", "10"))


def _calib_clean(calib: dict[str, float]) -> bool:
    return (
        calib["calib_sha_allcores_s"] <= CALIB_SHA_DEGRADED
        and calib["calib_spin_1t_s"] <= CALIB_SPIN_DEGRADED
    )


def _calibrate_gated() -> dict[str, float | bool]:
    calib = _calibrate()
    for _ in range(CALIB_RETRIES):
        if _calib_clean(calib):
            break
        print(
            f"bench: calib sha={calib['calib_sha_allcores_s']} "
            f"spin={calib['calib_spin_1t_s']} above degraded-host gate "
            f"({CALIB_SHA_DEGRADED}/{CALIB_SPIN_DEGRADED}), waiting "
            f"{QUIET_WAIT_S:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(QUIET_WAIT_S)
        calib = _calibrate()
    # Always stamp the key (ADVICE r9): a clean run records
    # degraded_host=False so post-hoc triage can tell "gate ran and
    # passed" from a pre-gate artifact, and the schema never varies by
    # outcome.
    calib["degraded_host"] = not _calib_clean(calib)
    return calib


# Warm-up runs per query before the timed samples. History: 1 through
# r8. Round 9 raised it to 2 per the r8 verdict's minhash plan audit:
# single-warm-up readings of JIT-heavy plans sit in the half-warm state
# (r7 measured minhash's C2-converged floor at 0.86 s vs the 0.98-1.24 s
# the 1-warm-up protocol recorded — the first timed run still pays tier-2
# compilation of the widest codegen stages). The second warm-up converges
# the JIT for ~25 s of extra suite wall; BASELINE.md carries the protocol
# note. Applied uniformly to every query — never per-plan special cases.
WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))


def _time_suite(registry, spark, names, sf_dir, runs=RUNS) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name].fn
        for _ in range(WARMUPS):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
    return timings


def main() -> None:
    start = _wait_for_quiet()
    load_start = None if start is None else start[0]
    load_start_5m = None if start is None else start[1]
    calib = _calibrate_gated()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    small_dir = os.environ.get(
        "SPARK_GRAFT_SF_SMALL_DIR", "/root/testdata/sf0.01"
    )
    small_sf = small_dir.rstrip("/").rsplit("sf", 1)[-1]

    import big_data_management_and_analytics_spark as engine
    from big_data_management_and_analytics_spark.sources.session import get_spark

    engine.load_all()
    registry = engine.all_queries()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings = _time_suite(registry, spark, HEADLINE, sf_dir)
    baselines = _time_suite(registry, spark, EXACT_BASELINES, sf_dir)
    small = (
        _time_suite(registry, spark, HEADLINE, small_dir)
        if os.path.isdir(small_dir) and small_dir != sf_dir
        else {}
    )
    scaling = {
        n: round(timings[n] / small[n], 2)
        for n in small
        if small.get(n, 0) > 0
    }

    # System load at start/end of the timed runs, for reading noisy
    # results in context: same-day replays of this suite have swung
    # 25-100% per query purely with external machine load (the r3
    # contamination_bloom 6.0 s incident, triaged in SCALE.md). A
    # reading taken at load >> ncpu/4 is machine state, not a plan
    # regression.
    end = _load_avg()
    load_end = None if end is None else end[0]

    # Mid-run host-flip visibility (VERDICT r10 item 7): the start gate
    # cannot see a host that degrades DURING the suite (r10 attempt 5:
    # clean start calib, minhash 2.577 s, post-run sha 0.528). Re-run
    # the calibration burst AFTER the suite and stamp the end readings +
    # degraded_mid_run so triage reads the flip from the JSON. Recorded,
    # never gated — the suite has already run.
    end_calib = _calibrate()
    calib["calib_spin_1t_end_s"] = end_calib["calib_spin_1t_s"]
    calib["calib_sha_allcores_end_s"] = end_calib["calib_sha_allcores_s"]
    calib["degraded_mid_run"] = not _calib_clean(end_calib)
    result = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "exact_baselines": baselines,
        "sf_small": float(small_sf),
        "queries_sf_small": small,
        "scaling_x": scaling,
        "load_avg_1m_start": load_start,
        "load_avg_5m_start": load_start_5m,
        **calib,
        "load_avg_1m_end": load_end,
    }
    line = json.dumps(result)
    # Round-4/5 verdict item 2: the driver captures only a bounded TAIL of
    # stdout, and the full ~3.3 KB result line kept getting its head clipped
    # (BENCH_r03-r05 all record parsed:null). Strategy: persist the full
    # artifact to a file, print it once for humans, then print a COMPACT
    # summary as the absolute LAST stdout bytes so even a small tail
    # window sees one complete parseable JSON object. Round-6 verdict
    # defect 1: the compact line must be SELF-SUFFICIENT for grading —
    # it now carries exact_baselines, sf_small, and scaling_x too
    # (everything except the redundant queries_sf_small raw timings,
    # recoverable as queries/scaling_x), serialized with no-space
    # separators: ~1.5 KB, still inside the observed ~2.3 KB tail
    # window with margin.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # stdout lines below are still the contract
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "queries": timings,
        "sf": result["sf"],
        "exact_baselines": baselines,
        "sf_small": result["sf_small"],
        "scaling_x": scaling,
        "load_avg_1m_start": load_start,
        "load_avg_5m_start": load_start_5m,
        **calib,
        "load_avg_1m_end": load_end,
    }
    spark.stop()
    sys.stdout.flush()
    print(line, flush=True)
    print(json.dumps(compact, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
