"""Scheduler tests, modeled on the reference's DeviceTests
(Echo.UnitTests/Common/DeviceTests.cs: schedule, pause/resume hammering,
completion + progress monotonicity, abort)."""

import time

import pytest

from echorenderer_tpu.processes.scheduler import (
    AbortError,
    Device,
    EventRow,
    OperationState,
)


@pytest.fixture
def device():
    d = Device()
    yield d
    d.dispose()


def _sleep_op(duration=0.2, steps=10):
    def run(control, stats):
        for i in range(steps):
            time.sleep(duration / steps)
            control.checkpoint(progress=(i + 1) / steps)
            stats.report("Step/Completed")
        return "done"

    return run


class TestDevice:
    def test_fifo_completion(self, device):
        ops = [device.schedule(f"op{i}", _sleep_op(0.05, 2)) for i in range(3)]
        assert device.await_idle(timeout=10)
        assert [o.state for o in ops] == [OperationState.COMPLETED] * 3
        assert all(o.result == "done" for o in ops)
        # strictly ordered: each started after the previous finished
        for a, b in zip(ops, ops[1:]):
            assert b.started >= a.finished

    def test_progress_monotone_and_stats(self, device):
        op = device.schedule("p", _sleep_op(0.1, 5))
        seen = []
        while op.state != OperationState.COMPLETED:
            seen.append(op.progress)
            time.sleep(0.01)
        assert all(b >= a for a, b in zip(seen, seen[1:]))
        assert op.stats["Step/Completed"] == 5

    def test_pause_resume(self, device):
        op = device.schedule("pause", _sleep_op(0.4, 20))
        time.sleep(0.06)
        device.pause()
        time.sleep(0.1)
        frozen = op.progress
        assert op.state in (OperationState.PAUSED, OperationState.RUNNING)
        time.sleep(0.15)
        assert op.progress == frozen  # no advance while paused
        device.resume()
        assert device.await_idle(timeout=10)
        assert op.state == OperationState.COMPLETED

    def test_pause_series(self, device):
        """Hammer pause/resume like the reference's PauseSeries test."""
        op = device.schedule("series", _sleep_op(0.4, 40))
        for _ in range(8):
            device.pause()
            time.sleep(0.01)
            device.resume()
            time.sleep(0.01)
        assert device.await_idle(timeout=15)
        assert op.state == OperationState.COMPLETED

    def test_abort(self, device):
        op1 = device.schedule("long", _sleep_op(5.0, 100))
        op2 = device.schedule("queued", _sleep_op(0.05, 2))
        time.sleep(0.1)
        device.abort()
        # the running op stops at its next checkpoint
        deadline = time.time() + 5
        while op1.state == OperationState.RUNNING and time.time() < deadline:
            time.sleep(0.01)
        assert op1.state == OperationState.ABORTED
        assert op1.progress < 1.0
        # a fresh op scheduled afterwards still runs
        op3 = device.schedule("after", _sleep_op(0.05, 2))
        assert device.await_idle(timeout=10)
        assert op3.state == OperationState.COMPLETED

    def test_failure_captured(self, device):
        def boom(control, stats):
            raise RuntimeError("exploded")

        op = device.schedule("fail", boom)
        next_op = device.schedule("next", _sleep_op(0.02, 1))
        assert device.await_idle(timeout=10)
        assert op.state == OperationState.FAILED
        assert "exploded" in op.error
        assert next_op.state == OperationState.COMPLETED


class TestEventRow:
    def test_counts(self):
        row = EventRow()
        row.report("Ray/Traced", 10)
        row.report("Ray/Traced", 5)
        row.report("Sample/Accepted")
        snap = row.snapshot()
        assert snap == {"Ray/Traced": 15, "Sample/Accepted": 1}


class TestScheduledRender:
    def test_render_via_device(self, device):
        """Full render scheduled as operations (ScheduledRender analogue)."""
        from echorenderer_tpu.models import scenes
        from echorenderer_tpu.processes.render import (
            EvaluationProfile,
            RenderProfile,
        )
        from echorenderer_tpu.scene.prepare import prepare_scene

        prepared = prepare_scene(scenes.cornell_box())
        prof = RenderProfile(
            resolution=(16, 12),
            evaluations=(
                EvaluationProfile(
                    evaluator="albedo", layer_name="albedo", max_epoch=1
                ),
            ),
        )
        ops = device.schedule_render(prepared, prof)
        assert device.await_idle(timeout=300)
        assert all(o.state == OperationState.COMPLETED for o in ops)
        assert device._render_layers["albedo"].shape == (12, 16, 3)
        assert ops[0].stats["Sample/Evaluated"] > 0
