"""Profiling subsystem tests (SURVEY.md §5.1: the reference has none)."""

import time

from inbed_pose_estimation_tpu.utils import StepTimer


def test_step_timer_phases_and_ips():
    t = StepTimer(ema=0.5)
    for _ in range(3):
        with t.phase("step"):
            time.sleep(0.01)
    assert t.counts["step"] == 3
    assert 0.005 < t.means["step"] < 0.1
    ips = t.images_per_sec(32)
    assert ips > 0
    s = t.summary(batch_size=32)
    assert "step=" in s and "ips=" in s


def test_step_timer_empty_summary():
    t = StepTimer()
    assert t.summary() == ""
    assert t.images_per_sec(32) == 0.0
