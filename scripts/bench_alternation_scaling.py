#!/usr/bin/env python
"""Per-batch alternation scaling campaign — symmetric-integration protocol (v3).

Why a fourth protocol. The v2 tight-pair campaigns (bench_elastic_scaling.py)
plateaued at raw-mode medians 0.736-0.778 over 6 campaigns / 86 valid pairs,
and the round-4 decomposition attributed the residual spread to time-varying
co-tenant bursts landing INSIDE a phase: a v2 phase replays the whole staged
feed (3-4 micro-batches, ~40-170 s depending on level), so a burst that lands
in one phase but not the other skews that pair, and the 16-slot phase
integrates ~4x more of the stochastic penalty in slot-seconds. The idle-gap
probes bound the ambient state AROUND a phase, never during one. VERDICT r4
"Next round" #2 asked for a protocol that integrates co-tenancy symmetrically;
this is option (a): fine-grained alternation, scoring paired adjacent
micro-batches.

Protocol. ONE long-lived driver app on the same real standalone cluster
(spark.cores.max=16, executor.cores=4, workers pinned to core quads). Each
CYCLE builds a fresh table and applies three staged 24M-event epochs with
`merge_cdc_batch` (the identical engine batch-apply unit whose duration_sec
is what v2's `batch_secs` record):

    e0 (untimed seed, always at 4 executors — epoch 0 is the insert-heavy
        regime; it exists so both TIMED merges run in the steady upsert
        regime against a seeded table)
    eA (TIMED at level L1)   <- ~15-40 s
    [resize + settle + JIT-warmup + mid gap probe]
    eB (TIMED at level L2)   <- ~15-40 s

The two timed merges of a pair sit ~60 s apart instead of v2's ~3-4 minutes,
so a co-tenant burst longer than one batch integrates into BOTH levels of the
pair, and one shorter than a batch invalidates the gap-probe stationarity
rule with ~3x better time resolution. Level order alternates per cycle
(1->4, 4->1), which also alternates WHICH epoch each level sees (epoch roles
are positional: eA=epoch1 always runs first, eB=epoch2 second), so any
epoch-content or table-size asymmetry flips sign across cycles and cancels
in the median rather than biasing it.

Pre-registered validity + scoring (fixed before the first r5 campaign ran,
applied uniformly, never tuned per result):
  * eff = steady_pair efficiency = (events/t@4execs) / (4 * events/t@1exec),
    t = merge_cdc_batch duration of the timed merge (v2's exact batch unit);
  * VALID iff the three idle-gap memcpy probes around the pair (before /
    between / after) satisfy max/min <= 1.35 (same band as v2) AND the
    executor count was stable at the target level across each timed merge;
  * auto-compaction is DISABLED for the campaign (threshold 10^9; folds are
    a different workload, already characterized by v2 — a fold landing
    inside one timed merge of a pair would be a single-sided cost);
  * every cycle's final table state is sha-verified against the staged
    3-epoch batch oracle (exactly-once under per-batch executor churn);
  * supplementary cuts reported beside (never instead of) the raw median:
    steal-quiet (/proc/stat hypervisor steal <= 1% in both timed merges),
    clock-normalized (per-pair SpinClock effective-clock ratio), and NEW —
    task-time efficiency.

Task-time efficiency (VERDICT r4 option (b), recorded per timed merge): the
sum of Spark executor task run time (`executorRunTime` over the stages the
merge submitted, from the driver REST status API) per event. Perfect scaling
means a 4x-wider cluster spends the SAME task-seconds on the same input;
tt_eff = task_seconds@1exec / task_seconds@4execs. This cut excludes
driver-serial and scheduler idle-slot asymmetry BY CONSTRUCTION (idle slots
accrue no task time), so raw_eff needs both engine parallelism AND a quiet
substrate, while tt_eff isolates "did the engine create 4x-parallel work
without inflating it" — the component the engine controls. Both are
reported; raw eff stays the number of record.

v3.1 refinement (after a 5-pair pilot, disclosed in the pool as
`r5a-pilot`, scored separately and not pooled with the campaign): the pilot
showed a systematic ~0.12 order split — (1->4)-order pairs ran the timed
4-executor merge on three freshly started executor JVMs whose only warmup
was the small v2 warmup merge in *mor* mode, i.e. the campaign's raw-mode
codegen/broadcast path was cold exactly when the order put the wide level
second. Fix (protocol-symmetry, not engine change — the same class of fix
as v2's untimed JIT warmup and warm-feed re-pin): after every scale-up the
untimed warmup merge now runs IN THE CAMPAIGN'S OWN mode/prefilter/L0
configuration, so every timed merge at either level starts from an
equally-warmed JVM set. Additionally the end-of-cycle sha verification runs
after scaling back to 4 executors (it was silently serializing ~30 s at 1
executor in (4->1) cycles; it is untimed either way).

v3.2 refinement (after the full 37-pair r5a campaign, pre-registered before
the first r5b cycle ran): r5a's per-merge task-second telemetry localized a
residual ~1.4x CPU inflation to exactly one cell — the 4-executor timed
merge when it runs SECOND in its cycle (quiet-pair task-seconds 99-105 vs
71-74 when it runs first), while the 1-executor merge costs the same
task-seconds in either position (65-68). The asymmetry's mechanism: a
scale-UP starts three fresh executor JVMs whose v3.1 warmup was only
2M events (~125k events/core at 16 cores — far below C2/JIT steady state),
while a scale-DOWN keeps worker 0's already-hot executor. A warm-JVM
asymmetry is protocol, not engine. Fix: the untimed in-mode warmup now runs
before EVERY timed merge at BOTH levels and is sized per active core
(1.5M events/core: 24M at 4 executors, 6M at 1 — the same events/core the
timed merge itself applies), generated with n_epochs=2 so the warmup
exercises the upsert/LWW regime the timed merges run in. Scoring, validity
rules and all supplementary cuts are unchanged from v3/v3.1.

Usage:
  python scripts/bench_alternation_scaling.py [max_cycles]
  python scripts/bench_alternation_scaling.py --report-only
Env: same as bench_elastic_scaling.py (ELASTIC_MINUTES, BENCH_EVENTS,
     BENCH_EPOCHS>=3, BENCH_FILES_PER_EPOCH, ELASTIC_MODE/PREFILTER/
     L0_GROUPS/SQLCONF/WARM_FEED/GAP_SYNC, ENGINE_GEN).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_elastic_scaling as ev2  # noqa: E402  (shared machinery)

POOL = os.path.join(REPO, "BENCH", "alternation_pairs.jsonl")
REPORT = os.path.join(REPO, "BENCH", "ALTERNATION.md")
UI_PORT = 4045
EXPECTED3 = os.path.join(ev2.FEED_DIR, "_expected_state_e012")


def epoch_files(epoch: int) -> list[str]:
    fs = sorted(glob.glob(os.path.join(
        ev2.FEED_DIR, f"epoch_{epoch:05d}_*.parquet")))
    if not fs:
        raise RuntimeError(f"no staged files for epoch {epoch}")
    return fs


def stage_expected3(spark) -> None:
    """Batch oracle for the 3 epochs each cycle applies (untimed, once)."""
    from etl_api_bigquery_spark.cdc import expected_final_state
    if os.path.exists(EXPECTED3):
        return
    feed = spark.read.parquet(*(epoch_files(0) + epoch_files(1)
                                + epoch_files(2)))
    (expected_final_state(feed).write.mode("overwrite").parquet(EXPECTED3))


# ------------------------------------------------------------- task-time
def _rest(path: str, port: int = UI_PORT):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/{path}", timeout=20) as r:
        return json.loads(r.read())


_app_ids: dict[int, str] = {}


def stage_watermark(port: int = UI_PORT) -> set[int]:
    """Set of stage ids the app has submitted so far (any status)."""
    try:
        if port not in _app_ids:
            _app_ids[port] = _rest("applications", port)[0]["id"]
        return {s["stageId"]
                for s in _rest(f"applications/{_app_ids[port]}/stages",
                               port)}
    except Exception:
        return set()


def task_seconds_since(seen: set[int], port: int = UI_PORT) -> float | None:
    """Executor task run seconds of stages submitted after the watermark."""
    try:
        stages = _rest(f"applications/{_app_ids[port]}/stages", port)
        new = [s for s in stages if s["stageId"] not in seen]
        return round(sum(s.get("executorRunTime", 0) for s in new) / 1e3, 2)
    except Exception:
        return None


# ------------------------------------------------------------------ merge
def campaign_warmup(spark, level_execs: int = 4) -> None:
    """Untimed JIT/codegen warmup in the CAMPAIGN configuration.

    v3.1 ran a fixed 2M-event merge after scale-ups only; r5a telemetry
    showed that leaves freshly started executors ~1.4x CPU-inflated for
    their first full-size merge (see module docstring, v3.2). Now sized
    per active core (1.5M events/core — the same events/core as a timed
    merge) and run before every timed merge at both levels, with
    n_epochs=2 so the upsert/LWW path (not just the insert path) is hot.
    """
    import shutil as _sh
    from pyspark.sql import types as T
    from etl_api_bigquery_spark.cdc import change_feed
    from etl_api_bigquery_spark.lake import LakeTable
    from etl_api_bigquery_spark.lake.merge import merge_cdc_batch
    schema = T.StructType([T.StructField(c, T.StringType()) for c in
                           ("repo", "path", "commit", "lang", "content")])
    n_ev = 1_500_000 * ev2.EXEC_CORES * level_execs
    wdir = f"{ev2.WORK}/alt_warmup_{level_execs}"
    _sh.rmtree(wdir, ignore_errors=True)
    wtab = LakeTable.create(spark, wdir, schema, key_cols=["repo", "path"],
                            num_buckets=ev2.NUM_BUCKETS)
    merge_cdc_batch(wtab, change_feed(spark, n_events=n_ev,
                                      n_keys=n_ev // 10, n_epochs=2),
                    batch_id=0, txn_app="alt-warm", salt_buckets=8,
                    mode=ev2.MODE, prefilter=ev2.PREFILTER,
                    prefilter_strategy=ev2.PREFILTER_STRATEGY,
                    l0_groups=ev2.L0_GROUPS, auto_compact_deltas=10 ** 9)


def timed_merge(spark, table, epoch: int, batch_id: int,
                level_execs: int, ui_port: int = UI_PORT,
                cpu_cores: set[int] | None = None) -> dict:
    """One instrumented merge_cdc_batch of a staged epoch at the current
    cluster size — the timed unit of a pair."""
    from etl_api_bigquery_spark.lake.merge import merge_cdc_batch
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(ev2.EXEC_CORES * level_execs))
    for k, v in ev2.SQLCONF.items():
        spark.conf.set(k, v)
    events = spark.read.parquet(*epoch_files(epoch))
    execs_before = ev2.n_execs(spark)
    seen = stage_watermark(ui_port)
    cpu0 = ev2._cpu_counters(cpu_cores)
    spin = ev2.SpinClock()
    try:
        m = merge_cdc_batch(
            table, events, batch_id=batch_id, txn_app="alt",
            salt_buckets=8, mode=ev2.MODE, prefilter=ev2.PREFILTER,
            prefilter_strategy=ev2.PREFILTER_STRATEGY,
            l0_groups=ev2.L0_GROUPS,
            auto_compact_deltas=10 ** 9)     # folds are a separate workload
    finally:
        clock_mops = spin.stop()
    cpu1 = ev2._cpu_counters(cpu_cores)
    d_total = max(cpu1[2] - cpu0[2], 1)
    return {
        "execs": level_execs,
        "execs_stable": execs_before == level_execs
        and ev2.n_execs(spark) == level_execs,
        "batch_sec": round(m.duration_sec, 3),
        "steady_events_per_sec": round(ev2.BATCH_EVENTS / m.duration_sec, 1),
        "task_seconds": task_seconds_since(seen, ui_port),
        "steal_frac": round((cpu1[0] - cpu0[0]) / d_total, 5),
        "iowait_frac": round((cpu1[1] - cpu0[1]) / d_total, 5),
        "clock_mops": clock_mops,
        "phases": m.extra.get("phases"),
    }


# ------------------------------------------------------------------ scoring
def load_pool() -> list[dict]:
    if not os.path.exists(POOL):
        return []
    with open(POOL) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _score(pool: list[dict]) -> dict:
    for p in pool:
        p["eff"] = round((p["p4"]["steady_events_per_sec"]
                          / p["p1"]["steady_events_per_sec"]) / 4, 3)
        gp = p["gap_gbps"]
        p["valid"] = (max(gp) / min(gp) <= ev2.VALID_BAND
                      and p["p1"]["execs_stable"]
                      and p["p4"]["execs_stable"])
        p["quiet"] = min(gp) >= ev2.QUIET_GBPS
        sf = [p[k].get("steal_frac") for k in ("p1", "p4")]
        p["steal_quiet"] = (None if any(s is None for s in sf)
                            else max(sf) <= 0.01)
        cm = [p[k].get("clock_mops") for k in ("p1", "p4")]
        p["clock_ratio"] = round(cm[1] / cm[0], 4) if all(cm) else None
        p["eff_clock_norm"] = (round(p["eff"] / p["clock_ratio"], 3)
                               if p["clock_ratio"] else None)
        tt = [p[k].get("task_seconds") for k in ("p1", "p4")]
        p["tt_eff"] = round(tt[0] / tt[1], 3) if all(tt) else None

    valid = [p for p in pool if p["valid"]]

    def med(ps, key="eff"):
        vals = [p[key] for p in ps if p.get(key) is not None]
        return round(statistics.median(vals), 3) if vals else None

    med_valid = med(valid)
    med_ratio = med(valid, "clock_ratio")
    # Pearson correlation of pair efficiency against the pair's measured
    # in-phase clock ratio: if the efficiency loss is the substrate's
    # (package clock / hypervisor co-scheduling), eff should TRACK the
    # clock instrument pair-by-pair; an engine-serial loss would not.
    cpairs = [(p["eff"], p["clock_ratio"]) for p in valid
              if p["clock_ratio"] is not None]
    corr = None
    if len(cpairs) >= 4:
        xs, ys = [c[1] for c in cpairs], [c[0] for c in cpairs]
        mx, my = statistics.mean(xs), statistics.mean(ys)
        sx = (sum((x - mx) ** 2 for x in xs)) ** 0.5
        sy = (sum((y - my) ** 2 for y in ys)) ** 0.5
        if sx > 0 and sy > 0:
            corr = round(sum((x - mx) * (y - my) for x, y in
                             zip(xs, ys)) / (sx * sy), 3)
    return {"n_pairs": len(pool), "n_valid": len(valid),
            "corr_eff_clock": corr,
            "n_quiet": len([p for p in valid if p["quiet"]]),
            "median_all": med(pool), "median_valid": med_valid,
            "median_quiet": med([p for p in valid if p["quiet"]]),
            "n_steal_quiet": len([p for p in valid if p["steal_quiet"]]),
            "median_steal_quiet": med([p for p in valid if p["steal_quiet"]]),
            "median_clock_ratio": med_ratio,
            "median_eff_clock_norm": med(valid, "eff_clock_norm"),
            "median_eff_robust_norm": (round(med_valid / med_ratio, 3)
                                       if med_valid and med_ratio else None),
            "n_tt": len([p for p in valid if p["tt_eff"] is not None]),
            "median_tt_eff": med(valid, "tt_eff"),
            "median_task_s_p1": _med_of(
                [p["p1"].get("task_seconds") for p in valid]),
            "median_task_s_p4": _med_of(
                [p["p4"].get("task_seconds") for p in valid])}


def _med_of(vals: list) -> float | None:
    vals = [v for v in vals if v]
    return round(statistics.median(vals), 1) if vals else None


def write_report() -> dict:
    gen = os.environ.get("ENGINE_GEN", "r5")
    gens = [g for g in os.environ.get(
        "ALT_REPORT_GENS", gen).split(",") if g]
    pool_all = [p for p in load_pool() if p.get("engine") in gens]
    pool = [p for p in pool_all if "p1" in p and "p4" in p]
    n_errors = len(pool_all) - len(pool)
    configs: dict[tuple, list[dict]] = {}
    for p in pool:
        key = (p.get("engine"), p.get("mode"), p.get("prefilter"),
               p.get("warm_feed", False))
        configs.setdefault(key, []).append(p)
    scored = {k: _score(ps) for k, ps in configs.items()}
    head = max((k for k in scored if k[0] == gens[0]), default=None,
               key=lambda k: scored[k]["n_valid"]) if scored else None
    summary = dict(scored.get(head) or {"n_pairs": 0, "n_valid": 0},
                   n_errors=n_errors,
                   configs={f"{k[0]}/{k[1]}/pf={k[2]}/warm={k[3]}": scored[k]
                            for k in scored})
    proto_notes = {
        "alternation_v3": (
            "per-batch alternation: one warm app, executors killed and "
            "restarted between the 1-exec and 4-exec merge of each pair; "
            "per-core-count untimed JIT warmup at campaign start"),
        "alternation_v3.2": (
            "v3 + a full-size untimed in-mode warm merge on the freshly "
            "started executors immediately before every timed merge"),
        "twin_v4": (
            "twin long-lived applications (4-exec BIG on workers 0-3, "
            "1-exec SMALL on worker 4, disjoint pinned cores) sharing one "
            "standalone master and committing into ONE LakeTable via the "
            "commit log's cross-process O_EXCL fencing; ZERO executor "
            "starts/stops between pairs — the scale event is which app "
            "runs the timed merge, as on a real fleet where both sizes "
            "are separate warm deployments. Adopted after v3/v3.2 "
            "isolated a ~1.3-1.5x task-second inflation on seconds-old "
            "executor JVMs that full-size in-mode warmup does not cure "
            "(executor-lifecycle physics, not engine; see "
            "scripts/bench_twin_alternation.py docstring)"),
    }
    lines = [
        "# BENCH/ALTERNATION.md — per-batch alternation protocols "
        "(v3 family + twin v4)",
        "",
        "VERDICT r4 'Next round' #2, option (a): alternate 1-executor and "
        "4-executor TIMED MERGES per micro-batch (pair span ~60 s vs v2's "
        "~3-4 min) so co-tenant bursts integrate into both levels of a pair "
        "symmetrically; plus option (b) recorded per merge: task-time "
        "efficiency from executor task metrics, which excludes "
        "scheduler/idle-slot asymmetry by construction. Protocol, validity "
        "rules and both supplementary cuts pre-registered in the script "
        "docstrings before each campaign ran. Every cycle sha-verifies its "
        "final table against the 3-epoch batch oracle. Raw pair efficiency "
        "over valid pairs stays the number of record. Scoring and validity "
        "rules are IDENTICAL across v3/v3.2/v4 (one `_score`); the "
        "protocols differ only in executor lifecycle, noted per section.",
    ]
    pooled = [p for p in pool if p.get("protocol") == "twin_v4"
              and p.get("warm_feed", False)]
    if pooled:
        ps = _score(pooled)
        lines += [
            "",
            f"**Pooled twin-v4 (protocol of record, warm-feed campaigns "
            f"{'+'.join(sorted({p['engine'] for p in pooled}))}): median "
            f"pair efficiency {ps['median_valid']} over {ps['n_valid']} "
            f"valid pairs ({ps['n_pairs']} measured), task-time efficiency "
            f"{ps['median_tt_eff']}.** Per-campaign sections below.",
        ]
    for key in sorted(configs, key=lambda k: (gens.index(k[0]),) + tuple(
            str(x) for x in k[1:])):
        s = scored[key]
        protos = sorted({p.get("protocol", "?") for p in configs[key]})
        # events per timed merge, recovered from the pair records themselves
        # (ev2.BATCH_EVENTS is the CURRENT env, not the campaign's)
        mev = statistics.median(
            p["p1"]["steady_events_per_sec"] * p["p1"]["batch_sec"]
            for p in configs[key]) / 1e6
        mev_s = f"{round(mev):g}"
        lines += [
            "",
            f"## {key[0]} ({'+'.join(protos)}): {key[1]} mode, "
            f"prefilter={key[2]}, warm_feed={key[3]}, "
            f"{mev_s}M events/timed merge",
            "",
            "_Protocol: " + "; ".join(
                proto_notes.get(pr, pr) for pr in protos) + "._",
            "",
            f"**Median pair efficiency over VALID pairs = "
            f"{s['median_valid']}** ({s['n_valid']} valid of "
            f"{s['n_pairs']} measured; BASELINE.json target >= 0.8). "
            f"Median over ALL pairs {s['median_all']}; valid&quiet "
            f"{s['median_quiet']} ({s['n_quiet']}); valid&steal-quiet "
            f"{s['median_steal_quiet']} ({s['n_steal_quiet']}). "
            f"Clock: median ratio {s['median_clock_ratio']}, "
            f"clock-normalized median {s['median_eff_clock_norm']} "
            f"(per-pair), noise-robust {s['median_eff_robust_norm']} "
            "(raw median / campaign-median ratio); Pearson corr of pair "
            f"eff against its own in-phase clock ratio: "
            f"**{s['corr_eff_clock']}** (a substrate-attributed loss "
            "tracks the clock instrument pair-by-pair; an engine-serial "
            "loss would not). "
            f"**Task-time efficiency: median {s['median_tt_eff']}** over "
            f"{s['n_tt']} valid pairs (task-seconds per {mev_s}M-event merge: "
            f"median {s['median_task_s_p1']} s @1 exec vs "
            f"{s['median_task_s_p4']} s @4 execs — idle-slot and "
            "driver-serial time excluded by construction).",
            "",
            "| # | order | epochs @1/@4 | gap probes GB/s | steal %@1/@4 "
            "| clk | task-s @1/@4 | ev/s @1 | ev/s @4 | eff | tt_eff "
            "| valid |",
            "|---|---|---|---|---|---|---|---|---|---|---|---|",
        ]
        for i, p in enumerate(configs[key]):
            gp = "/".join(f"{g:.1f}" for g in p["gap_gbps"])
            sf = [p[k].get("steal_frac") for k in ("p1", "p4")]
            steal = ("-" if any(s is None for s in sf)
                     else "/".join(f"{100 * s:.2f}" for s in sf))
            tt = [p[k].get("task_seconds") for k in ("p1", "p4")]
            tts = ("-" if any(t is None for t in tt)
                   else f"{tt[0]:.0f}/{tt[1]:.0f}")
            clk = f"{p['clock_ratio']:.3f}" if p["clock_ratio"] else "-"
            lines.append(
                f"| {i} | {p['order']} | {p['epoch_p1']}/{p['epoch_p4']} "
                f"| {gp} | {steal} | {clk} | {tts} "
                f"| {p['p1']['steady_events_per_sec']:,.0f} "
                f"| {p['p4']['steady_events_per_sec']:,.0f} "
                f"| {p['eff']:.3f} "
                f"| {p['tt_eff'] if p['tt_eff'] is not None else '-'} "
                f"| {'y' if p['valid'] else 'NO'} |")
    with open(REPORT, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return summary


# ------------------------------------------------------------------- main
def main() -> None:
    if "--report-only" in sys.argv:
        print(json.dumps(write_report()))
        return
    max_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    budget_sec = float(os.environ.get("ELASTIC_MINUTES", "50")) * 60
    os.sched_setaffinity(0, set(ev2.DRIVER_CORES))

    import subprocess
    from pyspark.sql import types as T
    from etl_api_bigquery_spark.lake import LakeTable
    from etl_api_bigquery_spark.session import get_spark
    procs: list[subprocess.Popen] = []
    extra_workers: list[subprocess.Popen] = []
    t_start = time.monotonic()
    try:
        procs.append(ev2.start_master())
        procs.append(ev2.start_worker(0))
        time.sleep(6)
        spark = get_spark(app_name="alternation-scaling",
                          master=ev2.MASTER_URL,
                          shuffle_partitions=4 * ev2.EXEC_CORES,
                          extra_conf={"spark.cores.max":
                                      str(4 * ev2.EXEC_CORES),
                                      "spark.executor.cores":
                                      str(ev2.EXEC_CORES),
                                      "spark.executor.memory": "8g",
                                      "spark.ui.enabled": "true",
                                      "spark.ui.port": str(UI_PORT),
                                      **ev2.APPCONF})
        spark.sparkContext.setLogLevel("ERROR")
        ev2.wait_execs(spark, 1)
        # Stage at FULL width (untimed): generation+write of the ~23 GB feed
        # is embarrassingly parallel; at 1 executor it serializes ~4x and
        # with the old defaultParallelism range split each epoch filter
        # collapsed to a single task (~12 min/epoch).
        extra_workers = [ev2.start_worker(i) for i in (1, 2, 3)]
        ev2.wait_execs(spark, 4)
        ev2.warmup_merge(spark)
        ev2.stage_inputs(spark)
        stage_expected3(spark)
        ev2.warm_feed()
        from etl_api_bigquery_spark.cdc.oracle import assert_replay_match
        schema = T.StructType([T.StructField(c, T.StringType()) for c in
                               ("repo", "path", "commit", "lang", "content")])

        def scale_to(n: int) -> None:
            nonlocal extra_workers
            if n == 4 and not extra_workers:
                extra_workers = [ev2.start_worker(i) for i in (1, 2, 3)]
                ev2.wait_execs(spark, 4)
            elif n == 1 and extra_workers:
                for p in extra_workers:
                    ev2.kill(p)
                extra_workers = []
                ev2.wait_execs(spark, 1)

        cycle = 0
        while cycle < max_cycles and time.monotonic() - t_start < budget_sec:
            order = (1, 4) if cycle % 2 == 0 else (4, 1)
            rec: dict = {"protocol": "alternation_v3.2",
                         "engine": os.environ.get("ENGINE_GEN", "r5"),
                         "num_buckets": ev2.NUM_BUCKETS, "mode": ev2.MODE,
                         "n_events": ev2.N_EVENTS,
                         "prefilter": ev2.PREFILTER,
                         "l0_groups": ev2.L0_GROUPS,
                         "ts": round(time.time(), 1),
                         "order": f"{order[0]}->{order[1]}",
                         "epoch_p1": 1 if order[0] == 1 else 2,
                         "epoch_p4": 1 if order[0] == 4 else 2,
                         "gap_gbps": []}
            if ev2.SQLCONF:
                rec["sqlconf"] = ev2.SQLCONF
            if os.environ.get("ELASTIC_WARM_FEED") == "1":
                rec["warm_feed"] = True
            try:
                ev2.warm_feed()
                ev2.gap_sync()
                tdir = f"{ev2.WORK}/alt_silver"
                shutil.rmtree(tdir, ignore_errors=True)
                table = LakeTable.create(spark, tdir, schema,
                                         key_cols=["repo", "path"],
                                         num_buckets=ev2.NUM_BUCKETS)
                # untimed seed: epoch 0 (insert regime) at 4 executors
                scale_to(4)
                spark.conf.set("spark.sql.shuffle.partitions",
                               str(4 * ev2.EXEC_CORES))
                from etl_api_bigquery_spark.lake.merge import merge_cdc_batch
                merge_cdc_batch(table, spark.read.parquet(*epoch_files(0)),
                                batch_id=0, txn_app="alt", salt_buckets=8,
                                mode=ev2.MODE, prefilter=ev2.PREFILTER,
                                prefilter_strategy=ev2.PREFILTER_STRATEGY,
                                l0_groups=ev2.L0_GROUPS,
                                auto_compact_deltas=10 ** 9)
                scale_to(order[0])
                campaign_warmup(spark, order[0])   # v3.2: per-core-scaled
                ev2.gap_sync()
                rec["gap_gbps"].append(ev2.probe_gbps())
                rec[f"p{order[0]}"] = timed_merge(
                    spark, table, epoch=1, batch_id=1,
                    level_execs=order[0])
                scale_to(order[1])
                campaign_warmup(spark, order[1])   # v3.2: both levels
                ev2.gap_sync()
                rec["gap_gbps"].append(ev2.probe_gbps())
                rec[f"p{order[1]}"] = timed_merge(
                    spark, table, epoch=2, batch_id=2,
                    level_execs=order[1])
                rec["gap_gbps"].append(ev2.probe_gbps())
                # untimed verification at full width (v3.1 — at 1 executor
                # it silently serialized ~30 s per (4->1) cycle)
                scale_to(4)
                match = assert_replay_match(
                    table.read(), spark.read.parquet(EXPECTED3))
                rec["rows_matched"] = match["total"]
            except Exception as exc:
                rec["error"] = repr(exc)[:500]
                with open(POOL, "a") as fh:
                    fh.write(json.dumps(rec) + "\n")
                print(json.dumps({"cycle": cycle, "error": rec["error"]}),
                      file=sys.stderr, flush=True)
                try:
                    scale_to(1)
                except Exception:
                    break
                cycle += 1
                continue
            with open(POOL, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            eff = round((rec["p4"]["steady_events_per_sec"]
                         / rec["p1"]["steady_events_per_sec"]) / 4, 3)
            tt = [rec[k].get("task_seconds") for k in ("p1", "p4")]
            gp = rec["gap_gbps"]
            print(json.dumps({
                "cycle": cycle, "order": rec["order"], "eff": eff,
                "tt_eff": round(tt[0] / tt[1], 3) if all(tt) else None,
                "stationary": max(gp) / min(gp) <= ev2.VALID_BAND,
                "gaps": gp}), flush=True)
            cycle += 1
    finally:
        for p in extra_workers:
            ev2.kill(p)
        for p in reversed(procs):
            ev2.kill(p)
        time.sleep(3)
    print(json.dumps(write_report()))


if __name__ == "__main__":
    main()
