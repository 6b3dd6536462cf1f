"""Step-wall telemetry (train/telemetry.py): percentiles + stall detection.

Pure host-side unit tests — the tracker is fed fake step walls. The
motivating incident is the 270 s tunnel stall inside the round-4 flagship
run that was only found by reading raw logs (BENCH.md); the reference logs
nothing about step timing at all (train.py:165-179).
"""

import numpy as np

from quickvc_tpu.train.telemetry import StepWallTracker


def test_no_stall_during_warmup():
    """The first `warmup` steps never flag — compiles land there."""
    t = StepWallTracker(stall_factor=5.0, warmup=20)
    # a 40 s compile step among 0.1 s steps, inside warmup
    for i in range(20):
        assert t.add(40.0 if i == 3 else 0.1) is None
    assert t.stalls == 0


def test_fake_slow_step_flags_once_and_keeps_median_robust():
    t = StepWallTracker(stall_factor=5.0, warmup=10)
    for _ in range(50):
        assert t.add(1.0) is None
    # the fake 270 s tunnel stall: flagged, and the returned running median
    # is the healthy step time
    med = t.add(270.0)
    assert med is not None and abs(med - 1.0) < 1e-9
    assert t.stalls == 1
    # healthy steps after the stall don't flag (median robust to the outlier)
    for _ in range(10):
        assert t.add(1.0) is None
    # 4.9x median is under the 5x threshold
    assert t.add(4.9) is None
    assert t.stalls == 1


def test_summary_percentiles_and_window_reset():
    t = StepWallTracker(warmup=5)
    walls = [0.9] * 90 + [2.0] * 9 + [30.0]
    for w in walls:
        t.add(w)
    s = t.summary()
    assert s["time/step_p50"] == 0.9
    assert s["time/step_p95"] == 2.0
    assert s["time/step_max"] == 30.0
    # the log window resets; the running-median window does not
    assert t.summary() == {}
    t.add(1.1)
    s2 = t.summary()
    assert s2["time/step_p50"] == s2["time/step_max"] == 1.1
    assert t.total_steps == 101


def test_stall_threshold_scales_with_median():
    """A 'slow' regime (e.g. full-transfer 4 s steps) doesn't false-flag:
    the threshold follows the running median, not an absolute number."""
    t = StepWallTracker(stall_factor=5.0, warmup=10)
    for _ in range(30):
        assert t.add(4.0) is None
    assert t.add(12.0) is None       # 3x median: slow but not a stall
    med = t.add(25.0)                # >5x median: stall
    assert med is not None and abs(med - 4.0) < 1e-9


def test_percentiles_match_numpy_convention_closely():
    rng = np.random.default_rng(0)
    t = StepWallTracker(warmup=5)
    xs = rng.uniform(0.5, 1.5, size=200)
    for x in xs:
        t.add(float(x))
    s = t.summary()
    assert abs(s["time/step_p50"] - np.percentile(xs, 50)) < 0.02
    assert abs(s["time/step_p95"] - np.percentile(xs, 95)) < 0.02


def test_median_none_before_warmup():
    t = StepWallTracker(warmup=5)
    for _ in range(4):
        t.add(1.0)
    assert t.median() is None
    t.add(1.0)
    assert t.median() == 1.0


def test_watchdog_warns_on_frozen_progress():
    """A full wedge (no completed windows at all) must produce a WARNING —
    the stall detector alone cannot see it (round-5 flagship: an 8-minute
    tunnel wedge was silent)."""
    import logging
    import time

    t = StepWallTracker(warmup=1)
    t.add(0.01)
    records = []

    class Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("watchdog-test")
    logger.addHandler(Cap())
    logger.setLevel(logging.WARNING)
    t.watchdog(logger, lambda: t.total_steps, interval=0.05, factor=1.0,
               floor=0.1)
    time.sleep(1.0)  # progress frozen the whole time
    assert any("watchdog: no training progress" in m for m in records)
