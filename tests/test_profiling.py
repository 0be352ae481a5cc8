import time

from pdac_pathological_image_segmentation_tpu.utils.profiling import StepTimer


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        t.start()
        time.sleep(0.002)
        t.stop()
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] >= 2.0
    assert s["p50_ms"] <= s["p95_ms"] * 1.0001
    t.reset()
    assert t.summary() == {}


def test_step_timer_stop_without_start_is_noop():
    t = StepTimer()
    t.stop()
    assert t.summary() == {}
