"""Scoring rules of the v3 per-batch alternation protocol (pure python —
no Spark session): pair efficiency, validity gating, and the three
supplementary cuts (steal-quiet, clock normalization, task-time
efficiency). The campaign script itself is exercised end-to-end by the
recorded campaigns; these tests pin the pre-registered arithmetic."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import bench_alternation_scaling as alt  # noqa: E402


def _pair(p1_rate, p4_rate, gaps=(16.0, 16.0, 16.0), stable=True,
          steal=(0.001, 0.001), clock=(6.5, 6.3), task=(60.0, 62.0)):
    return {
        "gap_gbps": list(gaps),
        "p1": {"steady_events_per_sec": p1_rate, "execs_stable": stable,
               "steal_frac": steal[0], "clock_mops": clock[0],
               "task_seconds": task[0]},
        "p4": {"steady_events_per_sec": p4_rate, "execs_stable": stable,
               "steal_frac": steal[1], "clock_mops": clock[1],
               "task_seconds": task[1]},
    }


def test_eff_and_tt_eff_arithmetic():
    s = alt._score([_pair(800_000, 2_560_000, task=(60.0, 75.0))])
    assert s["n_valid"] == 1
    assert s["median_valid"] == 0.8            # 2.56M / (4 * 800k)
    assert s["median_tt_eff"] == 0.8           # 60 / 75
    assert s["median_task_s_p1"] == 60.0
    assert s["median_task_s_p4"] == 75.0


def test_validity_gates():
    # gap-probe band: 16/11 > 1.35 -> invalid
    drifting = _pair(800_000, 2_560_000, gaps=(16.0, 11.0, 16.0))
    # executor churn mid-merge -> invalid
    churned = _pair(800_000, 2_560_000, stable=False)
    good = _pair(800_000, 2_560_000)
    s = alt._score([drifting, churned, good])
    assert s["n_pairs"] == 3 and s["n_valid"] == 1
    assert s["median_valid"] == 0.8


def test_clock_normalization_cuts():
    # 16-busy clock 10% lower than 4-busy: eff/clk = 0.72 / 0.9 = 0.8
    p = _pair(800_000, 4 * 800_000 * 0.72, clock=(7.0, 6.3))
    s = alt._score([p])
    assert s["median_clock_ratio"] == 0.9
    assert s["median_eff_clock_norm"] == 0.8
    # noise-robust variant: raw median / campaign-median ratio
    assert s["median_eff_robust_norm"] == 0.8


def test_steal_quiet_cut_requires_recording():
    recorded = _pair(800_000, 2_560_000, steal=(0.001, 0.02))  # 2% > 1%
    quiet = _pair(800_000, 2_880_000, steal=(0.001, 0.001))
    s = alt._score([recorded, quiet])
    assert s["n_steal_quiet"] == 1
    assert s["median_steal_quiet"] == 0.9


def test_missing_instruments_degrade_gracefully():
    p = _pair(800_000, 2_560_000)
    p["p1"]["clock_mops"] = None
    p["p1"]["task_seconds"] = None
    s = alt._score([p])
    assert s["median_valid"] == 0.8
    assert s["median_eff_clock_norm"] is None
    assert s["median_tt_eff"] is None and s["n_tt"] == 0


def test_exec_cores_knob_pins_workers_to_disjoint_ranges():
    """ELASTIC_EXEC_CORES reshapes the worker core pinning (footprint-
    sensitivity configuration: 2-core executors -> 8 cores at full width)
    without overlapping the probe (16,17) or driver (24-31) cores."""
    import importlib
    import subprocess
    import sys as _sys
    code = (
        "import os, sys; os.environ['ELASTIC_EXEC_CORES']='2';"
        "sys.path.insert(0, %r);"
        "import bench_elastic_scaling as ev2;"
        "print(ev2.EXEC_CORES, [w[1] for w in ev2.WORKERS])"
        % os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"))
    out = subprocess.run([_sys.executable, "-c", code], check=True,
                         capture_output=True, text=True).stdout.strip()
    assert out == "2 ['0-1', '2-3', '4-5', '6-7']"
    # the default (this process) stays the r3/r4 quad layout
    importlib.reload(alt)  # no-op guard: module import order unaffected
    ev2 = sys.modules["bench_elastic_scaling"]
    assert [w[1] for w in ev2.WORKERS] == ["0-3", "4-7", "8-11", "12-15"]
