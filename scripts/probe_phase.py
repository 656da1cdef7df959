#!/usr/bin/env python
"""One-off phase-telemetry probe at an elastic operating point.

Runs single replay phases (no pairing, no probes) at the requested executor
levels and prints one JSON line per phase with the full per-batch phase
decomposition. Used to attribute the residual N->4N efficiency loss to a
concrete term (write job / harvest / fsync / compact / streaming wrapper)
and to A/B config levers (prefilter on/off, shuffle codec) in minutes
instead of a full campaign per variant.

Usage:
  python scripts/probe_phase.py 4 1 [4 1 ...]        # levels, in order
  python scripts/probe_phase.py 4:off 4:on 1:off     # per-phase prefilter
Env: same as bench_elastic_scaling.py (BENCH_EVENTS, ELASTIC_MODE,
     ELASTIC_PREFILTER, ELASTIC_L0_GROUPS, ...) plus
     PROBE_EXTRA_CONF='{"spark.io.compression.codec": "lz4"}' (optional).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_elastic_scaling as bes  # noqa: E402


def main() -> None:
    specs = []
    for a in sys.argv[1:]:
        lvl, _, pf = a.partition(":")
        specs.append((int(lvl),
                      {"on": True, "off": False}.get(pf, bes.PREFILTER)))
    specs = specs or [(4, bes.PREFILTER), (1, bes.PREFILTER)]
    extra = json.loads(os.environ.get("PROBE_EXTRA_CONF", "{}"))
    os.sched_setaffinity(0, set(bes.DRIVER_CORES))

    from etl_api_bigquery_spark.session import get_spark
    procs = [bes.start_master(), bes.start_worker(0)]
    workers = {0: procs[1]}
    time.sleep(6)
    try:
        spark = get_spark(app_name="probe-phase", master=bes.MASTER_URL,
                          shuffle_partitions=16,
                          extra_conf={"spark.cores.max": "16",
                                      "spark.executor.cores": "4",
                                      "spark.executor.memory": "8g",
                                      **extra})
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

        for lvl, pf in specs:
            scale_to(lvl)
            bes.PREFILTER = pf
            res = bes.run_phase(spark, lvl)
            res["config"] = {"mode": bes.MODE, "prefilter": pf,
                             "l0_groups": bes.L0_GROUPS,
                             "batch_events": bes.BATCH_EVENTS,
                             "extra_conf": extra}
            print(json.dumps(res), flush=True)
    finally:
        for p in workers.values():
            bes.kill(p)
        bes.kill(procs[0])
        time.sleep(2)


if __name__ == "__main__":
    main()
