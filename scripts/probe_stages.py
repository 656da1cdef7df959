#!/usr/bin/env python
"""Stage-level decomposition probe for the elastic N vs 4N write-job gap.

The elastic pairs' phase telemetry (BENCH/elastic_pairs.jsonl) shows the
whole residual N->4N loss sits inside `write_job_s` — a single opaque action
covering the prefilter winner-set sub-job (scan + narrow agg), the
DRIVER-SERIAL broadcast-relation build, and the probe/filter/L0-write stage.
Fitting write = serial + work/cores to the recorded 24M pairs gives ~3-5 s
of non-scaling time per batch, but the phase timer cannot say WHICH segment.

This probe runs single phases like scripts/probe_phase.py but with the Spark
UI enabled, then harvests /api/v1 jobs + stages and prints, per batch:
  * every stage's [submission, firstTaskLaunched, completion] timeline,
    task count, executorRunTime/CpuTime, GC, input/shuffle bytes;
  * the GAPS — time inside the write job where NO stage has tasks running
    (driver-serial: broadcast collect+build, stage scheduling, commit
    bookkeeping) — the term that cannot scale with executors.

Usage (same env knobs as bench_elastic_scaling.py):
  BENCH_EVENTS=72000000 BENCH_EPOCHS=3 BENCH_FILES_PER_EPOCH=32 \
  ELASTIC_MODE=raw ELASTIC_PREFILTER=on ELASTIC_L0_GROUPS=32 \
  python scripts/probe_stages.py 4 1
Output: one JSON line per phase (stdout) with per-batch stage rows.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_elastic_scaling as bes  # noqa: E402

UI = "http://127.0.0.1:4040/api/v1"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=30) as r:
        return json.loads(r.read())


def _ms(iso: str | None) -> float | None:
    # "2026-08-18T12:34:56.789GMT" -> epoch seconds
    if not iso:
        return None
    from datetime import datetime, timezone
    s = iso.replace("GMT", "+0000")
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def harvest(t0: float, t1: float) -> list[dict]:
    """All stages whose lifetime intersects [t0, t1], with timelines."""
    app = _get("/applications")[0]["id"]
    rows = []
    for st in _get(f"/applications/{app}/stages?status=complete"):
        sub = _ms(st.get("submissionTime"))
        end = _ms(st.get("completionTime"))
        if sub is None or end is None or end < t0 or sub > t1:
            continue
        rows.append({
            "stage": st["stageId"],
            "name": st.get("name", "")[:80],
            "tasks": st.get("numCompleteTasks"),
            "sub": round(sub - t0, 3),
            "launch": round((_ms(st.get("firstTaskLaunchedTime")) or sub)
                            - t0, 3),
            "end": round(end - t0, 3),
            "run_s": round(st.get("executorRunTime", 0) / 1e3, 2),
            "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 2),
            "gc_s": round(st.get("jvmGcTime", 0) / 1e3, 2),
            "in_mb": round(st.get("inputBytes", 0) / 1e6, 1),
            "sh_r_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
            "sh_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
        })
    rows.sort(key=lambda r: r["sub"])
    return rows


def gaps(rows: list[dict], t0: float, t1: float) -> dict:
    """Seconds in [t0, t1] with no stage span active (task-occupied time
    uses [launch, end]; [sub, launch] is scheduler/broadcast-build time and
    counts as gap — it runs no executor tasks)."""
    spans = sorted((r["launch"], r["end"]) for r in rows)
    cur, occupied = 0.0, 0.0
    for a, b in spans:
        a, b = max(a, cur), max(b, cur)
        occupied += b - a
        cur = max(cur, b)
    total = t1 - t0
    return {"window_s": round(total, 2),
            "stage_occupied_s": round(occupied, 2),
            "gap_s": round(total - occupied, 2)}


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [4, 1]
    os.sched_setaffinity(0, set(bes.DRIVER_CORES))
    from etl_api_bigquery_spark.session import get_spark
    procs = [bes.start_master(), bes.start_worker(0)]
    workers = {0: procs[1]}
    time.sleep(6)
    try:
        spark = get_spark(app_name="probe-stages", master=bes.MASTER_URL,
                          shuffle_partitions=16,
                          extra_conf={"spark.cores.max": "16",
                                      "spark.executor.cores": "4",
                                      "spark.executor.memory": "8g",
                                      "spark.ui.enabled": "true",
                                      "spark.ui.retainedStages": "3000",
                                      "spark.ui.retainedJobs": "3000"})
        spark.sparkContext.setLogLevel("ERROR")
        bes.wait_execs(spark, 1)
        bes.warmup_merge(spark)
        bes.stage_inputs(spark)

        def scale_to(n: int) -> None:
            for i in range(1, 4):
                if n == 4 and i not in workers:
                    workers[i] = bes.start_worker(i)
                elif n == 1 and i in workers:
                    bes.kill(workers.pop(i))
            bes.wait_execs(spark, n)
            if n == 4:
                bes.warmup_merge(spark)

        for lvl in levels:
            scale_to(lvl)
            t0 = time.time()
            res = bes.run_phase(spark, lvl)
            t1 = time.time()
            stages = harvest(t0, t1)
            # attribute stages to batches by the per-batch wall boundaries,
            # anchored at the first stage submission (phase setup — table
            # create, checkpoint wipe — precedes batch 0; sha-verify stages
            # trail the last batch and fall outside every window)
            anchor = stages[0]["sub"] if stages else 0.0
            bounds, cur = [], anchor
            for s in res["batch_secs"]:
                bounds.append((cur, cur + s))
                cur += s
            batches = []
            for i, (a, b) in enumerate(bounds):
                rows = [r for r in stages if a <= r["sub"] < b]
                batches.append({"batch": i, "phase_window": [round(a, 2),
                                                             round(b, 2)],
                                "summary": gaps(rows, a, b),
                                "stages": rows})
            print(json.dumps({
                "level": lvl,
                "batch_secs": res["batch_secs"],
                "steady_events_per_sec": res["steady_events_per_sec"],
                "phases": res["phases"],
                "batches": batches}), flush=True)
    finally:
        for p in workers.values():
            bes.kill(p)
        bes.kill(procs[0])
        time.sleep(2)


if __name__ == "__main__":
    main()
