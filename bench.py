"""Benchmark harness (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints TWO JSON lines — the full-detail artifact, then a compact
summary as the FINAL line (the one the driver's bounded stdout tail
parses; r10 VERDICT item 5):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, "value_calibrated": ...,
   "window_stable": ..., "tiers": {...}}

Each query is materialized through the `noop` sink — full computation, no
driver-side collection cost, no column-pruning shortcut a count() would take.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one per operator family, weighted toward the shapes
# that dominate real pipelines (scan+agg, join+agg+topk, window, dedup, knn).
BENCH_QUERIES = [
    "wordcount_topk",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_count_distinct",
    "window_rank_topn_per_group",
    "events_sessionization",
    "dedup_minhash_lsh",
    "text_term_stats",
    "knn_bruteforce",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from slr207_mapreduce_spark.plans.base import all_queries
    from slr207_mapreduce_spark.session import get_session

    spark = get_session(app_name="slr207-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Quiet-window gate (r06 verdict item 4, tightened per r07 item 2):
    # r04->r05 swung ~25% on an identical tree purely from ambient machine
    # load, and the old relative threshold (0.2*cpus = 6.4 on 32 cores)
    # admitted loadavg 6.1 in r07 — a window ~22% slower than its quiet-box
    # twin, swamping round-over-round deltas. The gate is now ABSOLUTE
    # (default 2.0, env-overridable) with a longer wait budget, and if the
    # budget expires the artifact self-describes with "gate_failed": true
    # so a dirty window can never be read as a regression. Gate ONCE at
    # startup — before the warm pass — when the 1-min loadavg still
    # reflects only AMBIENT work (our own 32-core warm pass would trip any
    # per-run gate for the following minute, so per-run gating would
    # measure ourselves, not the noise).
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    gate_budget = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_BUDGET", "600"))
    gate_rejections = 0
    gate_waited = 0.0
    while os.getloadavg()[0] > load_gate and gate_waited < gate_budget:
        time.sleep(5.0)
        gate_waited += 5.0
        gate_rejections += 1
    gate_failed = os.getloadavg()[0] > load_gate

    # Calibration probe (r10, VERDICT r09 item 2): the loadavg gate sees
    # GUEST load only — host-side throughput variance (the r07/r09 "uniform
    # inflation" ambiguity: four same-tree quiet captures spanned
    # 4.37-6.83 s) is invisible to it. Three fixed CPU-bound kernels are
    # timed immediately before the warm pass and again after the last
    # tier: (a) a pinned single-thread numpy elementwise sweep (no BLAS
    # threading), (b) the same sweep on every core at once through a
    # thread pool (JIT-free multicore — the unit that actually detects
    # the host-regime shifts of SCALE.md round-12), and (c) a pinned
    # all-core JVM aggregation (the same resource the queries use).
    # Per-query walls are reported ALSO as
    # wall/calibration ratios — a host-noise drift inflates probe and
    # queries alike (flat calibrated ratios), a tree regression inflates
    # only its query. Round-over-round deltas should be read in calibrated
    # units first.
    def calibration_probe() -> dict[str, float]:
        import numpy as np
        from concurrent.futures import ThreadPoolExecutor

        def np_kernel() -> float:
            a = np.random.RandomState(42).rand(1_000_000)
            for _ in range(40):
                a = np.sin(a) * 1.0000001 + 0.1  # elementwise: single-thread
            return float(a[0])  # defeat dead-code elimination

        def np_once() -> float:
            t0 = time.perf_counter()
            np_kernel()
            return time.perf_counter() - t0

        # Multicore numpy probe (r13, VERDICT r12 finding 2): host-regime
        # shifts inflate multicore JVM wall ~50% while moving the
        # single-thread numpy probe only ~8% — neither old unit DETECTS
        # them (the JVM probe also carries its own JIT/scheduler variance,
        # so its movement alone can't be attributed to the host). This is
        # the same elementwise sweep run on every core at once via a
        # thread pool (numpy releases the GIL): JIT-free, scheduler-bound,
        # so its before/after ratio isolates multicore host throughput.
        n_threads = int(cpus)

        def np_mt_once() -> float:
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                list(pool.map(lambda _i: np_kernel(), range(n_threads)))
            return time.perf_counter() - t0

        def jvm_once() -> float:
            t0 = time.perf_counter()
            spark.range(0, 1_600_000_000, 1, int(cpus)).selectExpr(
                "sum(id % 7) AS s"
            ).collect()
            return time.perf_counter() - t0

        # The JVM kernel JIT-tiers DEEP: measured 0.37 -> 0.16 s over ~10
        # reps of the 400M variant, so a lightly-warmed "before" probe
        # reads slow against an "after" probe that rode the whole bench's
        # compilation. First call burns 6 extra reps to reach steady
        # state; every probe is then min-of-3 (the min is the
        # steady-state estimate — a lingering worker from the previous
        # tier inflates a single rep by 2x+, measured).
        if not getattr(calibration_probe, "_warmed", False):
            for _ in range(6):
                jvm_once()
            calibration_probe._warmed = True
        return {
            "numpy_1t_sec": round(min(np_once() for _ in range(3)), 4),
            "numpy_mt_sec": round(min(np_mt_once() for _ in range(3)), 4),
            "jvm_mt_sec": round(min(jvm_once() for _ in range(3)), 4),
        }

    # Warm pass: JVM JIT, parquet footers, codegen compilation. The timed
    # pass then measures steady-state engine throughput, not first-run
    # compilation (the metric that actually scales to long-running jobs).
    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    load_before = os.getloadavg()
    calibration_probe()  # warm the probe itself (JIT of the range-sum job)

    for name in BENCH_QUERIES:
        run(name)

    # min of FIVE timed runs (raised from 3, r06 verdict item 4): the min is
    # the standard low-noise estimator of steady-state cost (anything above
    # it is scheduler/GC jitter). The median and the full per-run lists ride
    # along so a loaded machine is auditable from the artifact alone: a
    # large median/min spread + high loadavg = env noise, not a regression
    # (BENCH_r03 and r05 both recorded phantom regressions exactly this way).
    #
    # Stable-window retry (r11 VERDICT item 6): the drift flag used to be
    # computed once over the WHOLE capture and the driver's r10/r11
    # artifacts both landed window_stable=false while the builder's twin
    # captured stable minutes later — host throughput changes on the
    # scale of one capture. The headline timed pass now retries (bounded,
    # default 3 attempts) until the probe pair bracketing IT is stable;
    # every attempt's drift is recorded like the loadavg gate's
    # rejections, so an exhausted budget is self-describing rather than a
    # silently-noisy number.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    drift_gate = float(os.environ.get("SPARK_GRAFT_DRIFT_GATE", "1.25"))
    stable_attempts = int(os.environ.get("SPARK_GRAFT_STABLE_ATTEMPTS", "3"))

    def probe_drift(b: dict[str, float], a: dict[str, float]) -> float:
        return max(
            max(b[k], a[k]) / max(1e-9, min(b[k], a[k]))
            for k in ("jvm_mt_sec", "numpy_1t_sec", "numpy_mt_sec")
        )

    attempt_drifts: list[float] = []
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for _attempt in range(max(1, stable_attempts)):
        cal_before = calibration_probe()
        timings, medians, all_runs = {}, {}, {}
        for name in BENCH_QUERIES:
            runs = sorted(run(name) for _ in range(n_runs))
            all_runs[name] = [round(r, 3) for r in runs]
            timings[name] = round(runs[0], 3)
            medians[name] = round(runs[len(runs) // 2], 3)
        cal_after = calibration_probe()
        drift = probe_drift(cal_before, cal_after)
        attempt_drifts.append(round(drift, 3))
        if drift <= drift_gate:
            break

    out = {
        "metric": "headline-query wall time, local[%s], sf=%s" % (cpus, sf),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "runs_per_query": n_runs,
        "runs": all_runs,
        "loadavg_gate": {
            "threshold": round(load_gate, 2),
            "rejections": gate_rejections,
            "waited_sec": gate_waited,
            "gate_failed": gate_failed,
        },
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }

    # sf1 tier: 10x the headline SF (6M lineitem rows), generated once into
    # .sfgen/sf1.0 by deterministic replication (tools/make_sf.py). Runs the
    # scale-SENSITIVE subset so input-size-dependent regressions (shuffle
    # blow-ups, id-layout instability, >2^53 numeric drift) show up in the
    # per-round artifact. Separate key — "value" stays the sf0.1 headline
    # for round-over-round comparability.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            from tools.make_sf import ensure_sf1

            sf1_dir = ensure_sf1(os.path.dirname(os.path.abspath(__file__)))
            sf1_queries = [
                "q1_pricing_summary",
                "dedup_minhash_lsh",
                "events_sessionization",
                "knn_lsh_bucketed",
                "pipeline_assign_ids",
                "pipeline_global_shuffle",
            ]

            def run_sf1(name: str) -> float:
                t0 = time.perf_counter()
                specs[name].build(spark, sf1_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0

            sf1_timings: dict[str, float] = {}
            for name in sf1_queries:
                run_sf1(name)  # warm
                sf1_timings[name] = round(min(run_sf1(name) for _ in range(2)), 3)
            out["sf1"] = {
                "sf": 1.0,
                "queries": sf1_timings,
                "value": round(sum(sf1_timings.values()), 3),
                "runs_per_query": 2,
            }
        except Exception as e:  # sf1 tier must never break the headline bench
            out["sf1"] = {"error": f"{type(e).__name__}: {e}"}

    # long-document tier: chunk/pack/minhash/CDC/BPE on a corpus whose
    # largest doc is 100k tokens (tools/make_sf.ensure_longdoc). The
    # O(tokens)-per-doc guarantees get a per-round timing record here;
    # tests/test_longdoc.py::test_longdoc_timed_budget is the hard
    # tripwire.
    if os.environ.get("SPARK_GRAFT_LONGDOC", "1") != "0":
        try:
            from tools.make_sf import ensure_longdoc

            ld_dir = ensure_longdoc(os.path.dirname(os.path.abspath(__file__)))
            ld_queries = [
                "pipeline_chunk_documents",
                "pipeline_pack_sequences",
                "dedup_minhash_lsh",
                "dedup_cdc_chunks",
                "text_bpe_apply",
                "text_lm_score",
            ]

            def run_ld(name: str) -> float:
                t0 = time.perf_counter()
                specs[name].build(spark, ld_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0

            ld_timings: dict[str, float] = {}
            for name in ld_queries:
                run_ld(name)  # warm
                ld_timings[name] = round(min(run_ld(name) for _ in range(2)), 3)
            out["longdoc"] = {
                "max_doc_tokens": 100_000,
                "queries": ld_timings,
                "value": round(sum(ld_timings.values()), 3),
                "runs_per_query": 2,
            }
        except Exception as e:
            out["longdoc"] = {"error": f"{type(e).__name__}: {e}"}

    # codec tier (r09): the multimodal family runs pure-Python kernels
    # inside blob-parallel mapInPandas — a regression here (lost
    # parallel fan-out, a de-cached table rebuild) is invisible to the
    # JVM-side headline set. Runs at the headline SF (5k docs), separate
    # key so "value" stays comparable across rounds.
    if os.environ.get("SPARK_GRAFT_CODEC", "1") != "0":
        try:
            codec_queries = [
                "multimodal_jpeg_roundtrip",
                "multimodal_jpeg_color_roundtrip",
                "multimodal_mjpeg_avi_roundtrip",
                "multimodal_mulaw_roundtrip",
                "multimodal_gif_roundtrip",
            ]
            codec_timings: dict[str, float] = {}
            codec_medians: dict[str, float] = {}
            codec_runs: dict[str, list[float]] = {}
            n_codec_runs = int(os.environ.get("SPARK_GRAFT_CODEC_RUNS", "3"))
            for name in codec_queries:
                run(name)  # warm
                # per-run lists + median recorded like the headline tier
                # (r09 ADVICE item 4) so a loaded-machine outlier is
                # distinguishable from a regression in the artifact alone
                runs = sorted(run(name) for _ in range(n_codec_runs))
                codec_runs[name] = [round(r, 3) for r in runs]
                codec_timings[name] = round(runs[0], 3)
                codec_medians[name] = round(runs[len(runs) // 2], 3)
            out["codec"] = {
                "sf": sf,
                "queries": codec_timings,
                "value": round(sum(codec_timings.values()), 3),
                "queries_median": codec_medians,
                "runs": codec_runs,
                "runs_per_query": n_codec_runs,
            }
        except Exception as e:  # must never break the headline bench
            out["codec"] = {"error": f"{type(e).__name__}: {e}"}

    # Calibrated view of the headline set. The probe pair brackets the
    # HEADLINE timed pass (the retried window above) — the tiers run
    # outside it, so a slow sf1/codec window can no longer flip the flag
    # on a clean headline capture; a closing post-tiers probe rides along
    # as context.
    jvm_cal = (cal_before["jvm_mt_sec"] + cal_after["jvm_mt_sec"]) / 2.0
    out["calibration"] = {
        "before": cal_before,
        "after": cal_after,
        "after_tiers": calibration_probe(),
        "jvm_mt_mean_sec": round(jvm_cal, 4),
        "numpy_1t_mean_sec": round(
            (cal_before["numpy_1t_sec"] + cal_after["numpy_1t_sec"]) / 2.0, 4
        ),
        "numpy_mt_mean_sec": round(
            (cal_before["numpy_mt_sec"] + cal_after["numpy_mt_sec"]) / 2.0, 4
        ),
        # headline walls divided by the all-core JVM probe: the unit a
        # round-over-round comparison should be read in (dimensionless;
        # host-noise cancels to first order)
        "queries_calibrated": {
            n: round(t / jvm_cal, 3) for n, t in timings.items()
        },
        "value_calibrated": round(sum(timings.values()) / jvm_cal, 3),
        # numpy-probe twin (r11): the r11 ABA session showed the JVM probe
        # moving 0.24-0.32 s across STABLE windows (its own JIT/scheduler
        # variance) while the numpy probe held 0.28-0.30 and identical
        # trees held ~4.7 s — so the jvm-calibrated headline can swing
        # 30% with no tree change. Read THIS unit first; treat the jvm
        # one as corroboration only when the two agree.
        "value_calibrated_numpy": round(
            sum(timings.values())
            / ((cal_before["numpy_1t_sec"] + cal_after["numpy_1t_sec"]) / 2.0),
            3,
        ),
        # worst before/after probe ratio around the ACCEPTED headline
        # window: > drift_gate means host throughput changed during the
        # timed pass itself even after the bounded retries — raw and
        # calibrated numbers from an unstable window are upper bounds,
        # not estimates
        "probe_drift_ratio": attempt_drifts[-1],
        "window_stable": attempt_drifts[-1] <= drift_gate,
        "stable_window_retry": {
            "threshold": drift_gate,
            "attempts": len(attempt_drifts),
            "budget": max(1, stable_attempts),
            "drifts": attempt_drifts,
        },
    }

    # Interleaved A/B/A fallback (r13, VERDICT r12 item 3b): when the
    # stable-window retry budget exhausts, raw walls from THIS capture are
    # upper bounds, not estimates — and three straight rounds landed
    # there. The only methodology that survives the measured multicore
    # host-regime shifts is interleaving the two trees inside the same
    # host-minutes: alternate single-pass runs of a headline subset
    # between the working tree (A) and a git worktree of the round-start
    # commit (B, the previous round's final tree + driver artifacts),
    # min-of-reps each side, report A/B. A ratio ≤ ~1.05 says HEAD is at
    # or below the round-start tree regardless of what the host is doing;
    # this turns the manual SCALE.md ABA procedure into a self-contained
    # artifact field. Opt-out / forcing via SPARK_GRAFT_ABA=0/1.
    aba_env = os.environ.get("SPARK_GRAFT_ABA", "auto")
    want_aba = aba_env == "1" or (
        aba_env == "auto" and not out["calibration"]["window_stable"]
    )
    if want_aba:
        try:
            import subprocess

            repo = os.path.dirname(os.path.abspath(__file__))
            ref = os.environ.get("SPARK_GRAFT_ABA_REF", "").strip()
            if not ref:
                # The driver commits VERDICT.md exactly once, at round
                # start — the commit that last touched it IS the pinned
                # reference tree the judge compares against.
                ref = subprocess.run(
                    ["git", "log", "-1", "--format=%H", "--", "VERDICT.md"],
                    cwd=repo,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout.strip()
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=repo,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
            wt = os.path.join(repo, ".sfgen", f"aba_{ref[:12]}")
            # Always add fresh (r13 ADVICE item 3): the finally block
            # removes the worktree unconditionally, so an isdir reuse
            # guard was dead in a normal run — and worse, a directory
            # left behind by a FAILED remove would be reused without
            # being registered in `git worktree list`. Clear any such
            # remnant first, then register a fresh checkout.
            if os.path.isdir(wt):
                subprocess.run(
                    ["git", "worktree", "remove", "--force", wt],
                    cwd=repo, capture_output=True, text=True,
                )
                if os.path.isdir(wt):
                    import shutil

                    shutil.rmtree(wt, ignore_errors=True)
                subprocess.run(
                    ["git", "worktree", "prune"],
                    cwd=repo, capture_output=True, text=True,
                )
            subprocess.run(
                ["git", "worktree", "add", "--detach", "--force", wt, ref],
                cwd=repo,
                capture_output=True,
                text=True,
                check=True,
            )
            aba_queries = [
                "q1_pricing_summary",
                "q5_local_supplier_volume",
                "dedup_minhash_lsh",
                "knn_bruteforce",
            ]
            script = os.path.join(repo, "tools", "aba.py")
            reps = int(os.environ.get("SPARK_GRAFT_ABA_REPS", "2"))

            def aba_pass(root: str) -> dict:
                p = subprocess.run(
                    [sys.executable, script, "--root", root, "--sf", sf_dir,
                     "--cpus", str(cpus), "--timed", "2", *aba_queries],
                    capture_output=True,
                    text=True,
                    timeout=600,
                    check=True,
                )
                return json.loads(p.stdout.strip().splitlines()[-1])

            a_passes: list[dict] = []
            b_passes: list[dict] = []
            try:
                for _rep in range(max(1, reps)):
                    a_passes.append(aba_pass(repo))
                    b_passes.append(aba_pass(wt))
            finally:
                # a timed-out/failed pass must not leave a full detached
                # checkout registered in `git worktree list` (r13 review);
                # if the remove itself fails, fall back to prune + rmtree
                # so a later run never reuses an UNREGISTERED directory
                # (r13 ADVICE item 3)
                rm = subprocess.run(
                    ["git", "worktree", "remove", "--force", wt],
                    cwd=repo,
                    capture_output=True,
                    text=True,
                )
                if rm.returncode != 0 or os.path.isdir(wt):
                    import shutil

                    shutil.rmtree(wt, ignore_errors=True)
                    subprocess.run(
                        ["git", "worktree", "prune"],
                        cwd=repo, capture_output=True, text=True,
                    )
            a_min = min(p["total"] for p in a_passes)
            b_min = min(p["total"] for p in b_passes)
            out["aba"] = {
                "ref": ref,
                "head": head,
                "queries": aba_queries,
                "reps": max(1, reps),
                "a_totals": [p["total"] for p in a_passes],
                "b_totals": [p["total"] for p in b_passes],
                "a_queries_min": {
                    n: min(p["queries"][n] for p in a_passes) for n in aba_queries
                },
                "b_queries_min": {
                    n: min(p["queries"][n] for p in b_passes) for n in aba_queries
                },
                # HEAD wall / round-start wall, same host-minutes: the
                # round-over-round number that IS valid under host drift
                "ratio": round(a_min / max(1e-9, b_min), 3),
            }
        except Exception as e:  # the ABA must never break the headline bench
            out["aba"] = {"error": f"{type(e).__name__}: {e}"}

    # Two lines (r10 VERDICT item 5): the full-detail artifact first, then
    # a compact summary as the FINAL line. The driver records the tail of
    # stdout and BENCH_r07-r10 all landed "parsed: null" because the
    # detail line (per-run lists, calibration captures) outgrew its
    # 2000-char window — the compact line carries the headline value, the
    # per-query mins, every tier's total, and the stability flags in
    # well under 1k chars, so the per-round artifact is parseable again.
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "value_median": out["value_median"],
        "value_calibrated": out["calibration"]["value_calibrated"],
        "value_calibrated_numpy": out["calibration"]["value_calibrated_numpy"],
        "probe_drift_ratio": out["calibration"]["probe_drift_ratio"],
        "window_stable": out["calibration"]["window_stable"],
        "stable_attempts": len(attempt_drifts),
        "gate_failed": gate_failed,
        "aba_ratio": (out.get("aba") or {}).get("ratio"),
        "tiers": {
            k: out[k].get("value")
            for k in ("sf1", "longdoc", "codec")
            if isinstance(out.get(k), dict)
        },
        "detail": "full artifact on the previous stdout line",
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
