"""Benchmark harness: runs every driver query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is materialized through Spark's noop sink (full execution, no
collect/driver funnel). A small warm-up query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution.

Attribution (VERDICT r4 "What's wrong" #1 — shared-suite numbers were
not attributable to plans vs host windows):

- a ~0.1 s fixed-work host probe runs BETWEEN entries and is emitted
  per-entry (``host_probe_sec``): a slow entry whose bracketing probes
  are also slow ran in a throttled host window, not a slower plan;
- any entry whose best-of differs >1.5× from its PER-QUERY MINIMUM
  across every committed ``BENCH_r*.json`` (the best reproduced prior)
  is automatically re-run in a FRESH JVM at suite end and both numbers
  are reported (``isolated_rerun``) — a shared-suite outlier that
  reproduces at its prior time isolated is host noise by construction.

Optional env:
- SPARK_GRAFT_BENCH_QUERIES: comma-separated subset to run
- SPARK_GRAFT_BENCH_REPEAT: repetitions per query (default 2, best-of;
  clamped to ≥1)
- SPARK_GRAFT_BENCH_REF: reference JSON for the >1.5× rerun trigger
  (default: per-query min across BENCH_r*.json next to this file)
- SPARK_GRAFT_BENCH_ISOLATED=1: child mode used by the auto-rerun —
  skips the parallel host probes and the rerun recursion
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import __spark_entry__ as E
from geotables_jl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-2 default: this host's available CPU drifts by minutes
    # (noisy neighbors); a single sample can misattribute a slow host
    # window to a query by 10x
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
    isolated = os.environ.get("SPARK_GRAFT_BENCH_ISOLATED") == "1"
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only = set(subset.split(",")) if subset else None

    sf = _sf_from_dir(sf_dir)
    host_pre = None if isolated else _host_parallel_ratio()
    spark = get_spark("bench", cpus=cpus)

    # warm-up: JVM + codegen + parquet footer caches, plus the Python
    # worker pool (first Arrow/pandas stage otherwise pays ~15s spawning
    # one worker per core — a long-running cluster keeps pools warm)
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    from pyspark.sql import functions as F

    def _noop_batch(it):
        for pdf in it:
            yield pdf

    spark.range(cpus * 4).repartition(cpus).withColumn("v", F.col("id") * 2).mapInPandas(
        _noop_batch, schema="id long, v long"
    ).write.format("noop").mode("overwrite").save()

    # gated queries + bench-only production-path twins (e.g. the
    # xxhash64 simhash vs the md5_60 oracle family the gate replays)
    qs = {**E.queries(), **getattr(E, "bench_extra", dict)()}
    times: dict[str, float] = {}
    probes: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # per-entry host probe: fixed single-thread work, so a 2×
        # slower probe means the HOST was 2× slower in this entry's
        # window — the per-entry attribution the suite-bracketing
        # probes could not give
        probes[name] = _probe_unit()
        best = None
        runs = 0
        improved_last = True
        while _more_runs(runs, repeat, best, improved_last):
            # adaptive tail: a heavy query whose LAST run is still its
            # best hasn't reached steady state (first runs pay JIT/
            # codegen of its operator family — measured 7-24s cold vs
            # 2.6s steady for the window+64-agg LSH plan); give it up
            # to two extra runs instead of reporting warm-up as plan
            # cost. Cheap queries (<2s) never take the tail.
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            improved_last = best is None or dt < best
            best = dt if best is None else min(best, dt)
            runs += 1
        times[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s (probe {probes[name]:.3f}s)", file=sys.stderr)
        _clear_session_state(spark)

    host_post = None if isolated else _host_parallel_ratio()

    ref_path, ref = ("", {}) if isolated else _reference_times()
    rerun = {} if isolated else _isolated_reruns(times, ref)

    # flagship throughput: geotagged pages joined into tiles, rows/sec
    n_pages = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    flagship = times.get("webpages_tiles")
    out = {
        "metric": "suite_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "flagship_rows_per_sec": round(n_pages / flagship, 1) if flagship else None,
        # per-entry host-state evidence (fixed work ⇒ seconds compare
        # across entries and rounds): slow entry + slow probe = host
        # window; slow entry + steady probe = plan/regression
        "host_probe_sec": probes,
        # fresh-JVM reruns of entries >1.5× their reference: the pair
        # (shared, isolated) makes every outlier attributable
        "isolated_rerun": rerun,
        "bench_ref": ref_path or None,
        # suite-bracketing probes: parallel throughput drift (BENCH.md
        # "Reproducibility") — ~4.0 = quiet host, ≲2.5 = throttled
        "host_par_ratio_4to16_pre": host_pre[0] if host_pre else None,
        "host_par_ratio_4to16_post": host_post[0] if host_post else None,
        "host_probe_t4_sec_pre": host_pre[1] if host_pre else None,
        "host_probe_t16_sec_pre": host_pre[2] if host_pre else None,
        "host_probe_t4_sec_post": host_post[1] if host_post else None,
        "host_probe_t16_sec_post": host_post[2] if host_post else None,
    }
    print(json.dumps(out))


def _more_runs(runs: int, repeat: int, best: float | None, improved_last: bool) -> bool:
    """Run again? Mandatory up to ``repeat``; then the adaptive tail
    grants ≤2 extra runs to entries >2 s whose LAST run set a new best
    (still descending = still warming). Explicit improved-last flag, not
    the float-equality-with-best heuristic (VERDICT r4 nit #5), and
    safe at repeat=0/best=None (ADVICE r4: the old form crashed)."""
    if runs < repeat:
        return True
    return best is not None and best > 2.0 and runs < repeat + 2 and improved_last


def _probe_unit() -> float:
    """~0.1 s of fixed single-thread work (sha256 chain) — a per-entry
    host-speed timestamp. Pure stdlib, zero shared state with Spark."""
    import hashlib

    t0 = time.perf_counter()
    for i in range(150_000):
        hashlib.sha256(str(i).encode()).digest()
    return round(time.perf_counter() - t0, 3)


def _reference_times() -> tuple[str, dict]:
    """(label, per-query seconds) of the comparison baseline for the
    rerun trigger: $SPARK_GRAFT_BENCH_REF (one file), or the per-query
    MIN across every committed BENCH_r*.json — the best reproduced
    prior. Comparing against the minimum (not the latest round) keeps a
    noisy prior round from masking a persistently-slow entry: anything
    >1.5× its best-known time gets the fresh-JVM rerun."""
    def _queries_of(d) -> dict:
        # bench.py's own line has top-level "queries"; the driver's
        # committed BENCH_r*.json wraps it under "parsed". Defensive
        # about shape (a list top level, "parsed": null for a failed
        # round) — a bad reference must never crash the suite at the
        # reporting step.
        if not isinstance(d, dict):
            return {}
        qs = d.get("queries") or (d.get("parsed") or {}).get("queries")
        return qs if isinstance(qs, dict) else {}

    path = os.environ.get("SPARK_GRAFT_BENCH_REF")
    if path:
        try:
            with open(path) as f:
                return path, _queries_of(json.load(f))
        except (OSError, ValueError):
            return "", {}
    ref: dict = {}
    cands = sorted(glob.glob(os.path.join(_HERE, "BENCH_r*.json")))
    for p in cands:
        try:
            with open(p) as f:
                qs = _queries_of(json.load(f))
        except (OSError, ValueError):
            continue
        for name, t in qs.items():
            if isinstance(t, (int, float)) and (name not in ref or t < ref[name]):
                ref[name] = t
    return ("min(BENCH_r*.json)" if ref else ""), ref


def _flag_outliers(times: dict, ref: dict, factor: float = 1.5, floor: float = 0.5) -> list:
    """Entries worth a fresh-JVM rerun: >factor× their reference AND
    above the absolute floor (sub-0.5 s deltas are scheduling jitter,
    not attributable plan cost). Worst ratio first."""
    flagged = [
        n
        for n, t in times.items()
        if ref.get(n) and t > factor * ref[n] and t >= floor
    ]
    return sorted(flagged, key=lambda n: times[n] / ref[n], reverse=True)


def _isolated_reruns(
    times: dict, ref: dict, max_reruns: int = 10, budget_sec: float = 360.0
) -> dict:
    """Re-run flagged entries in a fresh JVM each (child bench process,
    single query): the isolated number is free of suite ordering, page
    cache, and mid-suite host windows. Capped by count AND cumulative
    wall budget — a fully-throttled host flags everything, and the
    evidence from the worst offenders is what matters."""
    import subprocess

    out: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name in _flag_outliers(times, ref)[:max_reruns]:
        remaining = budget_sec - (time.perf_counter() - t_start)
        if remaining <= 0:
            break
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ISOLATED="1",
            SPARK_GRAFT_BENCH_QUERIES=name,
            SPARK_GRAFT_BENCH_REPEAT="2",
        )
        try:
            # the child's timeout is the REMAINING budget (+slack for
            # JVM startup) so one slow child cannot overshoot the
            # documented phase bound by its own full timeout
            r = subprocess.run(
                [sys.executable, os.path.join(_HERE, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=min(600.0, remaining + 60.0),
            )
        except subprocess.TimeoutExpired:
            continue
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if name in d.get("queries", {}):
                # carry the child's own host probe: an isolated rerun
                # can land in its own throttled window, and without its
                # probe the isolated number is as unattributable as the
                # shared one was
                out[name] = {
                    "sec": d["queries"][name],
                    "host_probe_sec": d.get("host_probe_sec", {}).get(name),
                }
            break
    return out


def _clear_session_state(spark) -> None:
    """Reset shared-session state between queries so query N's number
    never reflects query N-1's leftovers (VERDICT r3 'What's wrong' #3:
    ngram_jaccard recorded 10.06 s in the shared session but reproduces
    at 1.97 s isolated). Clears the SQL cache and unpersists any RDD a
    query left pinned (e.g. checkpoint blocks) — each bench entry is an
    independent job, so nothing legitimately spans two of them."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        jmap[k].unpersist(False)


def _host_parallel_ratio() -> tuple[float, float, float]:
    """(4→16 throughput ratio, t4 sec, t16 sec) — the same probe family
    as tools/scaling_bench.calibrate, sized to ~5 s. The ratio (ideal
    4.0) attributes SCALING throttling; the absolute seconds attribute
    ABSOLUTE host slowdown: the probe is fixed work (600k sha256 per
    process), so a round where t16 runs 2× a prior round's t16 ran on a
    host that was 2× slower, and every Spark number that round inherits
    that factor — without this, a slow window reads as a plan
    regression (it did in r3→r4: webpages_tiles recorded 17.8 s in one
    full-suite window and 2.6 s in a quiet one, identical plan)."""
    import subprocess

    code = "import hashlib\nfor i in range(600000): hashlib.sha256(str(i).encode()).digest()"

    def run(n: int) -> float:
        t0 = time.perf_counter()
        ps = [subprocess.Popen([sys.executable, "-c", code]) for _ in range(n)]
        for p in ps:
            p.wait()
        return time.perf_counter() - t0

    t4 = min(run(4), run(4))
    t16 = min(run(16), run(16))
    return round((16.0 / t16) / (4.0 / t4), 2), round(t4, 2), round(t16, 2)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


if __name__ == "__main__":
    main()
