#!/usr/bin/env python
"""Coordination-efficiency scaling: 1 coordinated 4-executor job vs 4
independent 1-executor jobs, run on the SAME fully-loaded host.

Why. The direct N vs 4N measurements (BENCH/ELASTIC.md, BENCH/CLUSTER.md)
run the two levels at different total load, so on a single host the 4N
level pays for a resource the 1-executor level doesn't stress: the host's
ONE memory subsystem. A real fleet multiplies memory channels/LLCs/heaps
with the executors, so that term is a single-host artifact. This protocol
cancels it by construction: BOTH levels occupy all 16 cores and saturate
the same memory bus —

  level C (coordinated):   one app, spark.cores.max=16 -> 4 executors,
                           the engine's shuffles/barriers/driver span all 4;
  level U (uncoordinated): four SIMULTANEOUS independent apps, each
                           spark.cores.max=4 -> 1 executor, separate tables,
                           same staged feed, file-barrier-synchronized so
                           their timed windows overlap.

  coordination efficiency = steady(C) / sum over the 4 U apps of steady(U_i)

Level U is the embarrassingly-parallel ideal — what 4x resources deliver
with zero coordination — so the ratio isolates exactly the cost the
N -> 4N rule is about: cross-executor shuffle, stragglers, driver-serial
phases. Every constituent run is sha256-verified against the batch oracle
before it may score. Validity gates (pre-registered, same instrument as
BENCH/ELASTIC.md): idle-gap memcpy probe max/min <= 1.35 across the pair's
three gaps; QUIET = all gaps >= 12 GB/s.

Usage: python scripts/bench_coord_scaling.py [max_pairs]   (or --report-only)
Env: COORD_MINUTES wall budget (default 40); feed knobs as in
bench_elastic_scaling.py (the feed + oracle must already be staged).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_elastic_scaling import (  # noqa: E402
    EXPECTED_DIR, QUIET_GBPS, VALID_BAND, kill, probe_gbps, spawn,
    start_master, start_worker)

POOL = os.path.join(REPO, "BENCH", "coord_pairs.jsonl")
REPORT = os.path.join(REPO, "BENCH", "COORD.md")
DRIVER_CORES = "24-31"
BARRIER_DIR = "/tmp/coord_barrier"

# ---- observational in-phase probe (NOT a validity gate — disclosed
# telemetry). The idle-gap gate cannot see a contention burst contained
# entirely inside one ~90s phase; a light continuous sampler (256 MB
# memcpy, ~0.5 s every 8 s, ~6% duty on the probe cores) records the
# bus state DURING each phase. Both levels load the bus equally (all 16
# cores active), so the sampler's self-traffic depression is symmetric;
# an asymmetry between a pair's two phase medians marks an external
# burst and explains tail ratios in both directions.
_INPHASE_CODE = """
import numpy as np, time, statistics
a = np.ones(32 * 1024 * 1024, dtype=np.float64)   # 256 MB
b = np.empty_like(a); np.copyto(b, a)
reps = []
for _ in range(3):
    t0 = time.perf_counter(); np.copyto(b, a)
    reps.append(2 * a.nbytes / (time.perf_counter() - t0) / 1e9)
print(round(statistics.median(reps), 2))
"""
_SAMPLES: list[tuple[float, float]] = []
_SAMPLER_STOP = False


def _sampler_loop() -> None:
    while not _SAMPLER_STOP:
        try:
            out = subprocess.run(
                ["taskset", "-c", "18,19", sys.executable, "-c",
                 _INPHASE_CODE],
                capture_output=True, text=True, timeout=60)
            _SAMPLES.append((time.time(), float(out.stdout.strip())))
        except Exception:
            pass
        time.sleep(8)


def phase_probe(t0: float, t1: float) -> dict:
    vals = [g for ts, g in _SAMPLES if t0 <= ts <= t1]
    return {"median_gbps": round(statistics.median(vals), 2) if vals
            else None, "n": len(vals)}


def run_solo(cores_max: int, tag: str, barrier: bool) -> subprocess.Popen:
    env = dict(os.environ, COORD_CORES_MAX=str(cores_max),
               COORD_WORK=f"/tmp/coord_{tag}")
    if barrier:
        env["WAIT_READY"] = f"{BARRIER_DIR}/ready_{tag}"
        env["WAIT_GO"] = f"{BARRIER_DIR}/go"
    return subprocess.Popen(
        ["taskset", "-c", DRIVER_CORES, sys.executable,
         os.path.join(REPO, "scripts", "solo_replay.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)


def collect(proc: subprocess.Popen, timeout: float = 600) -> dict:
    out, _ = proc.communicate(timeout=timeout)
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"solo replay failed (rc={proc.returncode})")
    return json.loads(lines[-1])


def run_coordinated() -> dict:
    return collect(run_solo(16, "c", barrier=False))


def run_uncoordinated() -> dict:
    shutil.rmtree(BARRIER_DIR, ignore_errors=True)
    os.makedirs(BARRIER_DIR)
    procs = [run_solo(4, f"u{i}", barrier=True) for i in range(4)]
    t0 = time.monotonic()
    while not all(os.path.exists(f"{BARRIER_DIR}/ready_u{i}")
                  for i in range(4)):
        if time.monotonic() - t0 > 300:
            for p in procs:
                p.kill()
            raise RuntimeError("uncoordinated apps never all became ready")
        time.sleep(0.2)
    open(f"{BARRIER_DIR}/go", "w").close()
    results = [collect(p) for p in procs]
    return {
        "steady_sum": round(sum(r["steady_events_per_sec"]
                                for r in results), 1),
        "per_app_steady": [r["steady_events_per_sec"] for r in results],
        "per_app_wall": [r["wall_sec"] for r in results],
        "rows_matched": [r["rows_matched"] for r in results],
    }


def load_pool() -> list[dict]:
    if not os.path.exists(POOL):
        return []
    with open(POOL) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def write_report() -> dict:
    full = load_pool()
    pool = [p for p in full if "coord" in p and "uncoord" in p]
    for p in pool:
        p["eff"] = round(p["coord"]["steady_events_per_sec"]
                         / p["uncoord"]["steady_sum"], 3)
        gp = p["gap_gbps"]
        p["valid"] = max(gp) / min(gp) <= VALID_BAND
        p["quiet"] = min(gp) >= QUIET_GBPS
    valid = [p for p in pool if p["valid"]]
    quiet = [p for p in valid if p["quiet"]]

    def med(ps):
        return round(statistics.median([q["eff"] for q in ps]), 3) if ps \
            else None

    summary = {"n_pairs": len(pool), "n_valid": len(valid),
               "n_quiet": len(quiet), "n_errors": len(full) - len(pool),
               "median_all": med(pool), "median_valid": med(valid),
               "median_quiet": med(quiet)}
    lines = [
        "# BENCH/COORD.md — coordination efficiency: 1x(4 executors) vs "
        "4x(1 executor), same host, same load",
        "",
        "Both levels of each pair occupy ALL 16 worker cores:",
        "",
        "  efficiency = steady(one 4-executor app) / "
        "sum of steady(four concurrent independent 1-executor apps)",
        "",
        "**What this measured (read before the table).** The protocol was "
        "designed to cancel the single-host memory-bus-sharing term by "
        "running both levels at equal total load. The time series "
        "falsified the premise it was meant to test: in verified-quiet "
        "windows the four independent apps reach ~4x the solo-alone rate "
        "(sum 2.0-2.16M ev/s vs 540-590k solo — only ~8% mutual penalty), "
        "proving the bus is NOT the binding constraint for separate-JVM "
        "scaling on this host. Two consequences. (1) The earlier "
        "shared-memory-subsystem attribution of the direct N->4N gap "
        "(BENCH/BASELINE.md, BENCH/CLUSTER.md) does not hold for the "
        "separate-JVM cluster form; the gap lives in the engine's "
        "distributed-regime costs — cross-executor shuffle "
        "serialization, stage-barrier stragglers, driver-serial phases — "
        "plus the fact that a 1-executor baseline shuffles entirely "
        "in-process (zero network cost), an ideal no production job has "
        "(see BENCH/MARGINAL.md for the measurement that removes that "
        "asymmetry). (2) This ratio is condition-dependent: under "
        "external co-tenant load the independents are suppressed more "
        "than the coordinated job and the ratio reads high (up to 1.49); "
        "in quiet windows it converges to the direct elastic number "
        "(~0.65). The median below is therefore reported as an "
        "attribution experiment, NOT as the gate metric.",
        "",
        "The uncoordinated baseline is the embarrassingly-parallel ideal "
        "(zero coordination, 4x resources); every constituent run "
        "sha256-verifies its final table against the batch oracle before "
        "it may score. Validity gates are pre-registered and identical to "
        f"BENCH/ELASTIC.md (idle-gap memcpy probe max/min <= {VALID_BAND}; "
        f"QUIET = all gaps >= {QUIET_GBPS} GB/s).",
        "",
        "Fairness notes. (1) Each independent app pays its own full "
        "driver-serial cost per batch, so the ratio charges the "
        "coordinated job only for what one driver spanning 4 executors "
        "adds — which is the correct accounting, since a real 4N job also "
        "has one driver. (2) The two levels of a pair still run "
        "sequentially (~3 min apart), so a contention burst contained "
        "entirely inside one phase passes the quiet-gap gate and lands on "
        "whichever side it hit — visibly in both directions in the table "
        "below (pairs well under the cluster's clean ratio AND one pair "
        "above 1.0 are both burst artifacts). The median over pairs is "
        "the defense: the contamination is symmetric by construction "
        "(order alternates), and the clean-run levels are stable "
        "(coordinated ~1.45M ev/s, uncoordinated sum ~1.5-1.75M). Later "
        "pairs also record an OBSERVATIONAL in-phase probe (continuous "
        "low-duty sampler during each phase; never used for gating, since "
        "it was added after the v1 gate was registered) — an asymmetry "
        "between a pair's two in-phase medians marks exactly such a "
        "burst.",
        "",
        f"Median over VALID pairs: {summary['median_valid']} "
        f"({summary['n_valid']} valid of {summary['n_pairs']}); over all "
        f"pairs {summary['median_all']}; over valid&quiet "
        f"{summary['median_quiet']} ({summary['n_quiet']}). Read per the "
        "paragraph above: an attribution experiment, not the gate metric "
        "(that is BENCH/MARGINAL.md, with BENCH/ELASTIC.md as the direct "
        "1->4 lower bound).",
        "",
        "| # | order | gap probes GB/s | in-phase C/U GB/s | coord ev/s "
        "| uncoord sum ev/s | per-app ev/s | eff | valid | quiet |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for i, p in enumerate(pool):
        gp = "/".join(f"{g:.1f}" for g in p["gap_gbps"])
        per = "+".join(f"{s / 1000:.0f}k"
                       for s in p["uncoord"]["per_app_steady"])
        ip = p.get("inphase") or {}

        def fmt_ip(lvl):
            v = (ip.get(lvl) or {}).get("median_gbps")
            return f"{v:.1f}" if v is not None else "-"

        lines.append(
            f"| {i} | {p['order']} | {gp} "
            f"| {fmt_ip('C')}/{fmt_ip('U')} "
            f"| {p['coord']['steady_events_per_sec']:,.0f} "
            f"| {p['uncoord']['steady_sum']:,.0f} | {per} "
            f"| {p['eff']:.3f} | {'y' if p['valid'] else 'NO'} "
            f"| {'y' if p['quiet'] else ''} |")
    lines += [
        "",
        "Raw pairs: `BENCH/coord_pairs.jsonl`. Protocol: "
        "`scripts/bench_coord_scaling.py` + `scripts/solo_replay.py`. "
        "Direct (different-total-load) N vs 4N measurements: "
        "BENCH/ELASTIC.md (tight elastic pairs), BENCH/CLUSTER.md and "
        "BENCH/BASELINE.md (wide pairs; lower bounds on a shared host).",
    ]
    with open(REPORT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return summary


def main() -> None:
    if "--report-only" in sys.argv:
        print(json.dumps(write_report()))
        return
    max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    budget = float(os.environ.get("COORD_MINUTES", "40")) * 60
    if not os.path.exists(EXPECTED_DIR):
        raise RuntimeError("stage the feed+oracle first "
                           "(run bench_elastic_scaling.py once)")
    procs = []
    t_start = time.monotonic()
    import threading
    sampler = threading.Thread(target=_sampler_loop, daemon=True)
    sampler.start()
    try:
        procs.append(start_master())
        for i in range(4):
            procs.append(start_worker(i))
        time.sleep(8)
        n = 0
        while n < max_pairs and time.monotonic() - t_start < budget:
            order = ("C", "U") if n % 2 == 0 else ("U", "C")
            rec: dict = {"protocol": "coord_v1", "engine": "r3",
                         "ts": round(time.time(), 1),
                         "order": "->".join(order), "gap_gbps": []}
            try:
                rec["gap_gbps"].append(probe_gbps())
                rec["inphase"] = {}
                for lvl in order:
                    t0 = time.time()
                    rec["coord" if lvl == "C" else "uncoord"] = (
                        run_coordinated() if lvl == "C"
                        else run_uncoordinated())
                    rec["inphase"][lvl] = phase_probe(t0, time.time())
                    rec["gap_gbps"].append(probe_gbps())
            except Exception as exc:
                rec["error"] = repr(exc)[:500]
            with open(POOL, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            if "error" not in rec:
                eff = round(rec["coord"]["steady_events_per_sec"]
                            / rec["uncoord"]["steady_sum"], 3)
                gp = rec["gap_gbps"]
                print(json.dumps(
                    {"pair": n, "order": rec["order"], "eff": eff,
                     "stationary": max(gp) / min(gp) <= VALID_BAND,
                     "gaps": gp}), flush=True)
            else:
                print(json.dumps({"pair": n, "error": rec["error"]}),
                      file=sys.stderr, flush=True)
            n += 1
    finally:
        global _SAMPLER_STOP
        _SAMPLER_STOP = True
        for p in reversed(procs):
            kill(p)
        time.sleep(3)
    print(json.dumps(write_report()))


if __name__ == "__main__":
    main()
