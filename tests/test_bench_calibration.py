"""Host-speed-factor policy tests (VERDICT r10 item 4-watch-item /
round-11 item 2), pinned on RECORDED calibration snapshots.

Round-10 evidence: the driver's bench reported a CPython-probe factor
of 1.205 (normalized 167.6 s) while its RAW 202.0 s matched the
builder (203.7) and judge (210.8) within 4% — the SHA-256 probes
over-read that rig's slowness relative to JVM query throughput, so the
normalized number would have hidden a real ~17% regression had one
occurred. The policy under test (bench.resolve_host_factor): the
post-run JVM codegen probe adjudicates; concordant probes (within 10%)
keep the CPython factor, discordant probes clamp into the JVM factor's
±10% band and flag the run non-concordant so raw totals stay the
comparison of record.

Pure-function tests — no SparkSession.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_policy", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_builder_r10_snapshot_concordant(bench):
    """The IMMUTABLE known-good calibration fixture (builder r10
    frozen tree, healthy rig epoch: raw 203.7 s agreed with driver and
    judge within 4.5%) must resolve to a ~1.0 concordant factor under
    the current CALIBRATION_REF pin — a re-pin that breaks the
    known-good epoch fails here. VERDICT r11 item 1: this test used to
    read the LIVE BENCH_QUERIES.json, which commit a2b79e2 legitimately
    overwrote with a flagged epoch, turning an honest record into a red
    suite; the policy is now pinned on a fixture the bench never
    rewrites."""
    snap = json.load(open(os.path.join(
        _REPO, "tests", "golden", "bench_calibration_known_good.json")))
    info = bench.resolve_host_factor(snap["pre"], snap["post"])
    assert info["concordant"], info
    assert 0.9 <= info["factor"] <= 1.1, info
    # concordant -> the CPython factor stands unmodified
    assert info["factor"] == info["factor_py"]


def test_committed_live_snapshot_is_resolvable_flagged_or_not(bench):
    """The LIVE BENCH_QUERIES.json records whatever the latest bench
    run measured — including an honestly-flagged discordant epoch.
    The suite must stay green either way: the policy only has to
    RESOLVE the committed calibration without error and agree with the
    file's own recorded concordant flag (resolved against the ref the
    file itself recorded, so a later CALIBRATION_REF re-pin cannot
    retroactively fail an archived epoch)."""
    snap = json.load(open(os.path.join(_REPO, "BENCH_QUERIES.json")))
    calib = snap["calibration"]
    info = bench.resolve_host_factor(
        calib["pre"], calib["post"], ref=calib["ref"],
        jvm_series=calib.get("jvm_probe_series"))
    recorded = snap.get("host_factor_info", {})
    if "concordant" in recorded:
        assert info["concordant"] == recorded["concordant"], (
            info, recorded)
    # flagged or not, the factor must be a sane positive number
    assert 0.1 < info["factor"] < 10, info


def test_jvm_probe_inflation_cannot_overcredit(bench):
    """ADVICE r11 (high): the committed r11 epoch had both CPython
    probes ~1.02 (the all-core probe directly contradicting any
    host-wide squeeze) while the high-variance JVM probe read 1.401;
    the old symmetric clamp published factor 1.273 — a ~20%
    self-favoring normalization. The factor must never move further
    from 1.0 than the CPython probes support: here it must stay at
    factor_py."""
    ref = bench.CALIBRATION_REF
    pre = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.157,
           "mt_probe_sec": ref["mt_probe_sec"] * 2.68,  # warm-up blip
           "jvm_probe_sec": ref["jvm_probe_sec"] * 7.3}  # cold JIT
    post = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.019,
            "mt_probe_sec": ref["mt_probe_sec"] * 1.014,
            "jvm_probe_sec": ref["jvm_probe_sec"] * 1.401}
    info = bench.resolve_host_factor(pre, post)
    assert not info["concordant"], info
    assert info["factor"] == info["factor_py"], info
    assert info["factor"] <= 1.05, info


def test_jvm_series_median_adjudicates_over_single_endpoint(bench):
    """Round-12: the final refresh run's single post-run JVM probe
    read 1.16x ref while its own steady 11-point series had median
    1.00 — one best-of-3 sample of this probe wanders ±30% with
    session state. With a recorded series, factor_jvm must come from
    the series median (ramp point excluded), so the run resolves
    concordant; without one, the post probe still adjudicates."""
    ref = bench.CALIBRATION_REF
    pre = {"cpu_probe_sec": ref["cpu_probe_sec"],
           "mt_probe_sec": ref["mt_probe_sec"] * 1.0,
           "jvm_probe_sec": ref["jvm_probe_sec"] * 1.57}  # cold JIT
    post = {"cpu_probe_sec": ref["cpu_probe_sec"],
            "mt_probe_sec": ref["mt_probe_sec"] * 1.006,
            "jvm_probe_sec": ref["jvm_probe_sec"] * 1.162}
    # the real final-run series (BENCH_QUERIES.json r12): steady,
    # median 0.0879 ~= ref 0.0876
    series = [0.0857, 0.0879, 0.0818, 0.1167, 0.0991, 0.0952,
              0.0769, 0.0796, 0.0669, 0.1033, 0.1018]
    with_series = bench.resolve_host_factor(pre, post, jvm_series=series)
    assert with_series["concordant"], with_series
    assert abs(with_series["factor_jvm"] - 1.0) < 0.05, with_series
    without = bench.resolve_host_factor(pre, post)
    assert not without["concordant"], without
    # a series that is ITSELF squeezed still yields a slow median —
    # the median path cannot hide a sustained squeeze
    squeezed = [s * 2.3 for s in series]
    sq = bench.resolve_host_factor(pre, post, jvm_series=squeezed)
    assert not sq["concordant"], sq
    assert sq["factor_jvm"] > 2.0, sq


def test_series_steady_and_squeezes():
    """resolve_series_flag policy on synthesized probe series
    (VERDICT r11 item 2): steady run passes; a step squeeze mid-run
    flags even when both endpoints look healthy; a squeeze landing
    only on the final endpoint probe also flags; short series are
    vacuously steady."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_policy_s", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    steady = [0.088, 0.090, 0.086, 0.091, 0.089]
    assert mod.resolve_series_flag(steady)["steady"]
    # mid-run squeeze, healthy endpoints — the r11 driver blind spot
    step = [0.088, 0.090, 0.180, 0.175, 0.089]
    flag = mod.resolve_series_flag(step)
    assert not flag["steady"] and flag["ratio"] > 1.9, flag
    # squeeze only at the post endpoint
    tail = [0.088, 0.090, 0.086, 0.091, 0.227]
    assert not mod.resolve_series_flag(tail)["steady"]
    # degenerate series cannot flag
    assert mod.resolve_series_flag([])["steady"]
    assert mod.resolve_series_flag([0.09])["steady"]
    assert mod.resolve_series_flag([None, 0.09])["steady"]
    # skip_ramp: the first interleaved JVM probe reads ~1.5x slow on
    # every run (C2 still compiling — both r12 adjudication runs);
    # excluded from the flag, a JIT ramp alone must not flag
    ramp = [0.135, 0.091, 0.088, 0.092, 0.090]
    assert not mod.resolve_series_flag(ramp, tolerance=1.15)["steady"]
    assert mod.resolve_series_flag(ramp, tolerance=1.15,
                                   skip_ramp=1)["steady"]
    # but a genuine squeeze after the ramp still flags
    rampsq = [0.135, 0.091, 0.200, 0.092, 0.090]
    assert not mod.resolve_series_flag(rampsq, tolerance=1.15,
                                       skip_ramp=1)["steady"]


def test_production_tolerances_calibrated_on_measured_runs():
    """The shipped SERIES_TOL_* must (a) pass the REAL measured series
    of the healthy r12 adjudication run 3 (endpoint factor 1.001,
    min-of-3 total within 2% of the r10 record — if that run flags,
    normalization never applies to anything) and (b) flag the judge-
    measured squeeze class (JVM probe at 2.59x the ~0.088 reference
    mid-run, CPython co-moving above its floor)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_policy_t", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # run-3 measured series (NOTES_r12 §3), GC-breathered probes
    jvm3 = [0.0652, 0.0929, 0.0977, 0.1075, 0.1002, 0.1261,
            0.0944, 0.091, 0.0965, 0.0675, 0.0848]
    cpu3 = [0.1012, 0.1169, 0.109, 0.1007, 0.1102, 0.1036,
            0.1, 0.1026, 0.1063, 0.1015, 0.1001]
    assert mod.resolve_series_flag(
        jvm3, tolerance=mod.SERIES_TOL_JVM, skip_ramp=1)["steady"]
    assert mod.resolve_series_flag(
        cpu3, tolerance=mod.SERIES_TOL_CPU)["steady"]
    # judge-measured squeeze: 2.59x JVM window mid-run
    jvm_sq = [0.090, 0.088, 0.227, 0.231, 0.089, 0.091]
    assert not mod.resolve_series_flag(
        jvm_sq, tolerance=mod.SERIES_TOL_JVM, skip_ramp=1)["steady"]
    # 32-way co-tenant squeeze visible to the CPython probe
    cpu_sq = [0.101, 0.103, 0.139, 0.141, 0.102, 0.100]
    assert not mod.resolve_series_flag(
        cpu_sq, tolerance=mod.SERIES_TOL_CPU)["steady"]


def test_driver_r10_overread_is_clamped_and_flagged(bench):
    """Reconstruction of the r10 driver rig from its printed line
    (BENCH_r10.json: host_speed_factor 1.205, raw 202.0 s ≈ builder's
    203.7 — so true JVM throughput was ~1.0x): CPython probes 20.5%
    slow, post-run JVM probe healthy. The old policy normalized
    202.0 -> 167.6 s (over-credit); the new policy must clamp the
    factor to <= 1.15 and flag the run non-concordant."""
    ref = bench.CALIBRATION_REF
    pre = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.205,
           "mt_probe_sec": ref["mt_probe_sec"] * 1.205,
           "jvm_probe_sec": ref["jvm_probe_sec"] * 2.0}  # cold JIT: ignored
    post = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.205,
            "mt_probe_sec": ref["mt_probe_sec"] * 1.205,
            "jvm_probe_sec": ref["jvm_probe_sec"] * 1.04}
    info = bench.resolve_host_factor(pre, post)
    assert not info["concordant"], info
    assert info["factor"] <= 1.15, info
    # clamped INTO the JVM band, not below it
    assert info["factor"] >= info["factor_jvm"] / 1.10, info
    # the over-read is recorded for the adjudicator
    assert info["factor_py"] == pytest.approx(1.205, abs=0.001)


def test_genuinely_slow_rig_keeps_full_factor(bench):
    """A real uniform slowdown (thermal / co-tenant) shows up in BOTH
    the CPython probes and the JVM probe — r7/r9's actual failure mode.
    There the full factor must apply so the normalized total stays
    comparable across rig epochs."""
    ref = bench.CALIBRATION_REF
    slow = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.25,
            "mt_probe_sec": ref["mt_probe_sec"] * 1.28,
            "jvm_probe_sec": ref["jvm_probe_sec"] * 1.24}
    info = bench.resolve_host_factor(slow, slow)
    assert info["concordant"], info
    assert info["factor"] == pytest.approx(1.28, abs=0.005)


def test_cotenant_squeeze_seen_by_allcore_and_jvm(bench):
    """A 32-way co-tenant squeeze leaves the single-thread probe clean
    but degrades the all-core probe AND the 32-partition JVM probe
    together — concordant, full factor from the WORSE CPython ratio."""
    ref = bench.CALIBRATION_REF
    c = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.01,
         "mt_probe_sec": ref["mt_probe_sec"] * 1.40,
         "jvm_probe_sec": ref["jvm_probe_sec"] * 1.38}
    info = bench.resolve_host_factor(c, c)
    assert info["concordant"], info
    assert info["factor"] == pytest.approx(1.40, abs=0.005)


def test_mt_probe_failure_falls_back_to_single_thread(bench):
    """ADVICE r10: a failed all-core probe (spawn restrictions) records
    None; the factor must fall back to the single-thread ratio instead
    of raising on None arithmetic."""
    ref = bench.CALIBRATION_REF
    c = {"cpu_probe_sec": ref["cpu_probe_sec"] * 1.05,
         "mt_probe_sec": None,
         "jvm_probe_sec": ref["jvm_probe_sec"] * 1.02}
    info = bench.resolve_host_factor(c, c)
    assert info["concordant"], info
    assert info["factor"] == pytest.approx(1.05, abs=0.005)


def test_mt_probe_reports_none_on_subprocess_failure(bench, monkeypatch):
    """_mt_probe must not raise a bare ValueError when the subprocess
    dies — it returns None with a stderr diagnostic (ADVICE r10)."""
    import subprocess

    def boom(*a, **k):
        return subprocess.CompletedProcess(a, 1, stdout="", stderr="denied")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._mt_probe() is None


def test_fast_rig_normalizes_up_when_concordant(bench):
    """Symmetry: a rig FASTER than the reference (factor < 1) must
    normalize the total UP when both probe families agree — otherwise
    a fast rig epoch would fake a perf win."""
    ref = bench.CALIBRATION_REF
    c = {"cpu_probe_sec": ref["cpu_probe_sec"] * 0.80,
         "mt_probe_sec": ref["mt_probe_sec"] * 0.82,
         "jvm_probe_sec": ref["jvm_probe_sec"] * 0.81}
    info = bench.resolve_host_factor(c, c)
    assert info["concordant"], info
    assert info["factor"] == pytest.approx(0.82, abs=0.005)


def test_cpu_series_median_symmetric_with_jvm(bench):
    """Round-13 (NOTES_r12 §9): the single-thread CPython estimate now
    comes from the interleaved series median when one exists, removing
    the last single-sample probe from the adjudication path. On the
    REAL committed r12 series (median 0.1019 vs endpoint-min 0.0998)
    the factor moves by ~2% and stays concordant; a series with one
    lucky fast outlier no longer lets the outlier adjudicate; and with
    no series, the endpoint-min fallback is unchanged."""
    ref = bench.CALIBRATION_REF
    pre = {"cpu_probe_sec": 0.0999, "mt_probe_sec": ref["mt_probe_sec"],
           "jvm_probe_sec": ref["jvm_probe_sec"]}
    post = {"cpu_probe_sec": 0.0998, "mt_probe_sec": ref["mt_probe_sec"],
            "jvm_probe_sec": ref["jvm_probe_sec"]}
    # the real r12 committed-snapshot series (BENCH_QUERIES.json)
    series = [0.1009, 0.1062, 0.1067, 0.1009, 0.1013, 0.1013,
              0.1019, 0.1048, 0.1005, 0.1024, 0.0998]
    with_series = bench.resolve_host_factor(pre, post, cpu_series=series)
    med = sorted(series)[len(series) // 2]
    assert abs(with_series["factor_py"] - med / ref["cpu_probe_sec"]) < 0.01, (
        with_series
    )
    assert with_series["concordant"], with_series
    # one lucky fast sample inside a slow run: min-policy would read
    # the host as healthy; the median reports the sustained state
    slow = [0.13] * 10 + [0.0999]
    squeezed = bench.resolve_host_factor(pre, post, cpu_series=slow)
    assert squeezed["factor_py"] > 1.25, squeezed
    # no series: endpoint-min fallback byte-identical to the old policy
    none = bench.resolve_host_factor(pre, post)
    assert none["factor_py"] == bench.resolve_host_factor(
        pre, post, cpu_series=[]
    )["factor_py"]
