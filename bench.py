#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Emission contract (round-6 verdict item 1 -- BENCH_r06.json came back
``parsed: null`` because one ~6 KB JSON line with two 45-query dicts
overflowed the driver's tail capture): per-query median/min detail is
written to ``BENCH_DETAIL.json`` AND printed on its own EARLY stdout
line; the LAST stdout line is a compact headline small enough for any
tail buffer:
  {"metric": "headline_queries_total_sec", "value": <sum of medians>,
   "value_min": <sum of mins>, "unit": "sec", "sf": 0.1, "n": 5,
   "protocol": "median", "n_queries": K,
   "common_with_prev": {...five scalars...}}

Protocol (stated in the JSON so round-over-round trend is signal, not
protocol drift): one warm-up run per query (JIT + code cache), then
``n=5`` timed runs reporting BOTH the median (the headline + trend
stat -- robust to a loaded machine) and the min (the floor the engine
can hit); timing includes full plan execution to a count-style action
(no driver-side collect of big results). Round-13 protocol bump
(tag "median+warm3sub1s", r12 verdict item 7): rows whose first
block medians < 1 s get 2 extra warm-ups and a fresh n=5 block
(sub-second rows measured mid-JIT-ramp otherwise), and the warm-up
wall is recorded per query as ``queries_cold`` (r12 verdict item 4:
cold evidence for persist decisions, additions-only). Dispersion rationale (round-5
verdict item 5): the r4->r5 driver bench swung +13% with zero code
changes on the affected queries -- machine-load noise at sub-second
query times exceeded the delta, and a single best-of-3 number cannot
distinguish environment drift from a real regression. Median+min can:
a regression moves BOTH; load moves only the median.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


N_RUNS = 5  # median + min over N; stated in the output JSON

# Measured cross-session dispersion floor. Evidence trail:
# - round-7 double-run, identical binaries: 42.68 s vs 48.64 s (13%);
# - round-8 double-run, same day, idle box, untouched-query subtotal:
#   45.87 s vs 52.35 s (14%); vs the r7 record the same untouched set
#   read 42.03 s -> 52.35 s (24.6%), with isolated n=5 re-runs
#   CONFIRMING the slow numbers on unchanged code (sub-second queries
#   swung up to 3.4x: boilerplate_line_removal 0.39 s -> 1.31 s).
# The box's cross-session spread is therefore ~25%, and a subtotal
# delta inside it is dispersion. Real regressions are still visible:
# they move ONE query's min consistently across sessions (see the
# per-query detail), while box drift moves the whole set together.
CROSS_SESSION_NOISE_PCT = 25.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # tolerate dirs not named .../sf<number>: unknown sf, not a crash
    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    from etl_on_weather_dataset_spark.operators.caching import release_all
    from etl_on_weather_dataset_spark.plans.registry import bench_queries
    from etl_on_weather_dataset_spark.session import get_spark

    # Size shuffle partitions to the data, not the core count: at
    # sf<=0.1 the largest shuffle is ~tens of MB, where 8 partitions
    # beat 32 by ~15% (task-scheduling overhead). AQE still coalesces
    # further; at cluster scale the default (cores-based, higher) wins.
    shuffle_parts = 8 if (sf is not None and sf <= 0.5) else None
    spark = get_spark(app_name="bench", shuffle_partitions=shuffle_parts)
    spark.sparkContext.setLogLevel("ERROR")

    qs = bench_queries()
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    timings_cold: dict[str, float] = {}
    # i-th timed repetition of the whole suite, for the noise band
    rep_totals: list[float] = [0.0] * N_RUNS

    def _timed_runs(fn, name: str) -> list[float]:
        runs: list[float] = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        return runs

    for name, fn in sorted(qs.items()):
        # warm-up (plan + JIT); cheap relative to steady state. The
        # warm-up wall is recorded as the COLD first-rep sample
        # (round-12 verdict item 4: additions-only -- honest local
        # evidence for persist decisions, which the warm reps flatter
        # because operator-internal persists materialize here and all
        # timed reps scan the cache). Caveat: for fixture-cached
        # queries (component store pristine build, ANN stores) the
        # first cold sample also pays the per-process fixture build.
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings_cold[name] = round(time.perf_counter() - t0, 4)
        runs = _timed_runs(fn, name)
        if statistics.median(runs) < 1.0:
            # JIT-ramp guard (round-12 verdict item 7, anchored
            # protocol bump, recorded in the "protocol" field):
            # sub-second rows measured mid-JIT-ramp at one warm-up
            # (dedup_minhash_lsh: 2.3 -> 0.9 s over 12 consecutive
            # reps of unchanged code), inflating medians up to 2x
            # regime-dependently. Two extra warm-ups then a fresh
            # n=5 block; heavier rows keep the round-1..12 protocol
            # (their JIT share is negligible and re-running them
            # would double the suite wall).
            fn(spark, sf_dir).count()
            fn(spark, sf_dir).count()
            runs = _timed_runs(fn, name)
        for i, r in enumerate(runs):
            rep_totals[i] += r
        timings[name] = round(statistics.median(runs), 4)
        timings_min[name] = round(min(runs), 4)
        # drop operator-internal caches (shingle index, minhash
        # signatures) between queries so cached blocks don't accumulate
        # across the suite; within a query's runs they stay warm (same
        # steady-state the round-1/2 protocol measured)
        release_all()

    total = round(sum(timings.values()), 4)
    total_min = round(sum(timings_min.values()), 4)
    # Noise band (round-7 verdict item 5): within-session dispersion of
    # the N suite totals, floored at the measured CROSS-session band --
    # SCALE.md measured ~12-13% between clean same-binary runs (r7's
    # two runs of identical code: 42.68 s vs 48.64 s). Trend claims
    # inside the band are dispersion, not direction.
    within = round(
        100.0 * (max(rep_totals) - min(rep_totals))
        / statistics.median(rep_totals), 1,
    ) if statistics.median(rep_totals) > 0 else 0.0
    noise_band_pct = max(within, CROSS_SESSION_NOISE_PCT)
    detail = {
        "queries": timings,
        "queries_min": timings_min,
        "queries_cold": timings_cold,
        "sf": sf,
        "n": N_RUNS,
        # "median+warm3sub1s": median of n=5 warm reps, with 1+2
        # warm-ups (and a fresh rep block) for rows whose first block
        # medianed < 1 s -- the round-13 JIT-ramp protocol bump. The
        # tag makes the trend break explicit; comparisons stay
        # median-to-median (see _prev_bench_record's startswith check).
        "protocol": "median+warm3sub1s",
        "noise_band_pct": noise_band_pct,
        "noise_within_session_pct": within,
    }
    # Per-query detail: to a file (the durable in-repo record a future
    # round's trend line can read even if the driver's tail buffer
    # truncates stdout) AND an early stdout line for humans. The
    # compact headline is printed LAST -- the driver parses the final
    # line, and BENCH_r06.json proved a ~6 KB final line overflows its
    # 2000-char tail capture (round-6 verdict item 1).
    (Path(_REPO) / "BENCH_DETAIL.json").write_text(json.dumps(detail))
    # Per-ROUND frozen record (round-7 verdict item 2): stamp the
    # current round (max committed BENCH_r{N}.json + 1) into a
    # BENCH_DETAIL_r{N}.json so the next round's trend anchor can
    # never be clobbered by a later local run of a different round.
    # Only at the driver's bench scale (sf0.1) -- a local sf0.001
    # smoke run must not become the round's trend anchor.
    # Clobber guard (round-9 verdict item 7): a re-run must never
    # silently overwrite an existing round anchor -- the first write
    # of round N wins unless SPARK_GRAFT_BENCH_FORCE=1 (the driver's
    # own post-commit refresh sets it; a stray local run doesn't).
    rnd = _current_round()
    if rnd is not None and sf == 0.1:
        detail_r = {"round": rnd, **detail}
        anchor = Path(_REPO) / f"BENCH_DETAIL_r{rnd:02d}.json"
        if anchor.exists() and not os.environ.get(
            "SPARK_GRAFT_BENCH_FORCE"
        ):
            print(
                f"bench.py: {anchor.name} already exists -- NOT "
                "overwriting the round anchor (set "
                "SPARK_GRAFT_BENCH_FORCE=1 to force, or "
                "SPARK_GRAFT_BENCH_ROUND to pin a different round)",
                file=sys.stderr,
            )
        else:
            anchor.write_text(json.dumps(detail_r))
    print(json.dumps(detail))
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "value_min": total_min,
        "unit": "sec",
        "sf": sf,
        "n": N_RUNS,
        "n_queries": len(timings),
        "protocol": "median+warm3sub1s",
        "noise_band_pct": noise_band_pct,
    }
    # Like-for-like trend line (r4 verdict item 7): the subtotal over
    # queries ALSO benched last round, so the headline growing with
    # the query set never obscures a regression. Prefer the driver's
    # parsed artifact; when parsed is null (r6), fall back to the
    # committed BENCH_DETAIL_r{N}.json reconstruction for that round.
    prev_doc, prev_name = _prev_bench_record()
    if prev_doc is not None:
        # compare like stat with like: median-to-median when the
        # prior record carries full medians; else min-to-min (the r6
        # reconstruction only has queries_min); else our min vs a
        # legacy best-of-N record
        if str(prev_doc.get("protocol", "")).startswith("median") and \
                prev_doc.get("queries"):
            prev_q, ours, basis = prev_doc["queries"], timings, "median"
        elif prev_doc.get("queries_min"):
            prev_q, ours, basis = (
                prev_doc["queries_min"], timings_min, "min_vs_prev_min"
            )
        else:
            prev_q, ours, basis = (
                prev_doc.get("queries", {}), timings_min, "min_vs_prev_best"
            )
        common = sorted(set(prev_q) & set(ours))
        if common and prev_doc.get("sf") == sf:
            sub = round(sum(ours[q] for q in common), 4)
            prev_sub = round(sum(prev_q[q] for q in common), 4)
            ratio = round(sub / prev_sub, 3) if prev_sub else None
            # Direction is claimed ONLY outside the noise band
            # (round-7 verdict item 5): |ratio-1| within the band is
            # dispersion -- r7's stale "0.90x faster" claim came from
            # exactly this trap.
            direction = "n/a"
            if ratio is not None:
                band = noise_band_pct / 100.0
                if ratio > 1.0 + band:
                    direction = "slower"
                elif ratio < 1.0 - band:
                    direction = "faster"
                else:
                    direction = "flat_within_noise"
            out["common_with_prev"] = {
                "prev_artifact": prev_name,
                "basis": basis,
                "n_queries": len(common),
                "subtotal_sec": sub,
                "prev_subtotal_sec": prev_sub,
                "ratio": ratio,
                "direction": direction,
            }
    print(json.dumps(out))
    spark.stop()


def _current_round() -> int | None:
    """Current round number: max committed BENCH_r{N}.json + 1.

    The driver writes BENCH_r{N}.json at the END of round N, so while
    round N is in progress the newest artifact is N-1's. A local
    re-run AFTER the driver commits BENCH_r{N}.json would infer N+1
    and pre-seed the NEXT round's trend anchor with this round's
    numbers (round-8 advice); SPARK_GRAFT_BENCH_ROUND pins the round
    explicitly for that case.
    """
    env = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if env:
        return int(env)
    rounds = [
        int(m.group(1))
        for p in Path(_REPO).glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    return max(rounds) + 1 if rounds else None


def _prev_bench_record() -> tuple[dict | None, str | None]:
    """Latest usable prior-round per-query record.

    Walk BENCH_r{N}.json newest-first; use its ``parsed`` payload when
    non-null, else the committed ``BENCH_DETAIL_r{N}.json``
    reconstruction (r6's parsed is null -- its only complete per-query
    record is the reconstruction). Malformed artifacts never break the
    bench.
    """
    for p in sorted(Path(_REPO).glob("BENCH_r*.json"), reverse=True):
        try:
            doc = json.loads(p.read_text())
            parsed = doc.get("parsed", doc)
            if parsed and (
                parsed.get("queries") or parsed.get("queries_min")
            ):
                return parsed, p.name
            rec = p.with_name(
                p.stem.replace("BENCH_", "BENCH_DETAIL_") + ".json"
            )
            if rec.exists():
                return json.loads(rec.read_text()), rec.name
        except (ValueError, OSError):
            continue
    return None, None


if __name__ == "__main__":
    main()
