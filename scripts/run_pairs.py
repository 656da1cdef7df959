#!/usr/bin/env python
"""Run interleaved local[4]/local[16] scaling pairs and append them to
BENCH/pairs_log.jsonl (the accumulating evidence base that
scripts/report_scaling.py turns into BENCH/BASELINE.md).

One "pair" = the two parallelism levels run back-to-back under CPU
affinity on the byte-identical staged feed; the ratio of their steady
(min-batch) throughputs cancels the shared host's minute-scale noise.
Each record also carries the per-trigger driver-phase telemetry bench.py
emits, so the driver-serial audit in the report is re-measured rather
than hardcoded.

Usage: python scripts/run_pairs.py [n_pairs] [session_tag]
Env forwarded to bench.py: BENCH_EVENTS (default 48M), BENCH_EPOCHS (4),
BENCH_FILES_PER_EPOCH (64), SPARK_DRIVER_MEMORY (12g).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "pairs_log.jsonl")
LEVELS = (4, 16)


def run_level(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_EVENTS=os.environ.get("BENCH_EVENTS", "48000000"),
               BENCH_EPOCHS=os.environ.get("BENCH_EPOCHS", "4"),
               BENCH_FILES_PER_EPOCH=os.environ.get(
                   "BENCH_FILES_PER_EPOCH", "64"),
               SPARK_DRIVER_MEMORY=os.environ.get(
                   "SPARK_DRIVER_MEMORY", "12g"),
               BENCH_SKIP_QUERIES="1",
               # noise control comes from pair interleaving, not reps
               BENCH_REPLAY_REPS="1")
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    session = sys.argv[2] if len(sys.argv) > 2 else "r3"
    existing = sum(1 for ln in open(LOG) if ln.strip()) \
        if os.path.exists(LOG) else 0
    for i in range(n_pairs):
        rec: dict = {"session": session, "pair": existing + i}
        for c in LEVELS:
            r = run_level(c)
            rec[f"steady_{c}"] = r["events_per_sec_steady"]
            rec[f"total_{c}"] = r["events_per_sec"]
            rec[f"wall_{c}"] = r["value"]
            rec[f"phases_{c}"] = r.get("merge_phase_avg_sec", {})
            rec[f"trigger_{c}"] = r.get("trigger_avg_sec", {})
        rec["eff"] = round((rec["steady_16"] / rec["steady_4"]) / 4, 3)
        rec["note"] = f"{session} pair {i} (post driver-serial cut)"
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps({"pair": rec["pair"], "eff": rec["eff"],
                          "steady_4": rec["steady_4"],
                          "steady_16": rec["steady_16"]}), flush=True)


if __name__ == "__main__":
    main()
