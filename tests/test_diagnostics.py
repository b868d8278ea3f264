"""Diagnostics layer: host ensure, structured logging, device checkify
asserts (reference src/Echo.Core/Common/Diagnostics/{Ensure,Loggers}.cs)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.utils import diagnostics as dg


def test_ensure_inactive_by_default(monkeypatch):
    monkeypatch.delenv("ECHO_DEBUG", raising=False)
    dg.ensure(False, "must not raise")  # release build: no-op


def test_ensure_active_under_flag(monkeypatch):
    monkeypatch.setenv("ECHO_DEBUG", "1")
    dg.ensure(True, "fine")
    with pytest.raises(AssertionError, match="negative radius"):
        dg.ensure(False, "negative radius")


def test_logger_named_and_structured(caplog):
    log = dg.get_logger("scheduler")
    assert log.name == "echo.scheduler"
    root = logging.getLogger("echo")
    root.propagate = True  # the console handler owns output in production
    try:
        with caplog.at_level(logging.INFO, logger="echo.scheduler"):
            dg.log_event(log, "operation_done", samples=1024, seconds=0.51)
    finally:
        root.propagate = False
    assert "operation_done samples=1024 seconds=0.51" in caplog.text


def test_dcheck_noop_without_flag(monkeypatch):
    monkeypatch.delenv("ECHO_DEBUG_DEVICE", raising=False)

    @jax.jit
    def f(x):
        dg.dcheck(x > 0, "positive input")  # traces to nothing
        return x * 2.0

    assert float(f(jnp.asarray(-1.0))) == -2.0


def test_dcheck_raises_through_run_checked(monkeypatch):
    monkeypatch.setenv("ECHO_DEBUG_DEVICE", "1")

    def f(x):
        dg.dcheck(jnp.isfinite(x), "non-finite throughput")
        return x + 1.0

    out = dg.run_checked(f, jnp.asarray(1.0))
    assert float(out) == 2.0
    with pytest.raises(Exception, match="non-finite throughput"):
        dg.run_checked(f, jnp.asarray(np.inf))


def test_path_step_checks_clean_on_cornell(monkeypatch):
    """A real render's first epoch passes the device invariants (and the
    checked path produces the same numbers as the plain path)."""
    monkeypatch.setenv("ECHO_DEBUG_DEVICE", "1")
    from echorenderer_tpu.models import scenes
    from echorenderer_tpu.processes.render import (EvaluationProfile,
                                                   RenderProfile, render)
    from echorenderer_tpu.scene.prepare import prepare_scene

    prepared = prepare_scene(scenes.cornell_box())
    prof = RenderProfile(resolution=(16, 12), evaluations=(
        EvaluationProfile(evaluator="path", samples_per_epoch=2, max_epoch=1,
                          bounce_limit=3, adaptive=False),))
    out = render(prepared, prof)
    img = out["main"]
    assert np.all(np.isfinite(img))

    monkeypatch.delenv("ECHO_DEBUG_DEVICE", raising=False)
    out2 = render(prepared, prof)
    np.testing.assert_array_equal(img, out2["main"])
