"""Diagnostics: device-side debug assertions + structured logging.

Rebuild of the reference's diagnostics layer
(src/Echo.Core/Common/Diagnostics/Ensure.cs — DEBUG-conditional asserts —
and Loggers.cs:5-13 — pluggable named loggers). The TPU analogue of an
`Ensure.IsTrue` inside device code is `jax.experimental.checkify`: `dcheck`
calls below trace to nothing in production (zero cost) and become real
checkified assertions when `ECHO_DEBUG_DEVICE=1`, surfaced by running the
program through `run_checked` (the render CLI exposes `--debug-device`).

Host-side, `ensure` mirrors Ensure.cs (active under `ECHO_DEBUG=1` or
`__debug__` builds of the reference; here: the env flag), and `get_logger`
gives the structured console logger the reference's Loggers provide.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Callable

# ---------------------------------------------------------------------------
# Structured logging (reference Common/Diagnostics/Loggers.cs)
# ---------------------------------------------------------------------------

_LOG_FORMAT = "%(asctime)s.%(msecs)03d %(levelname)-7s [%(name)s] %(message)s"
_DATE_FORMAT = "%H:%M:%S"
_configured = False


def _configure_root():
    global _configured
    if _configured:
        return
    root = logging.getLogger("echo")
    if not root.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, _DATE_FORMAT))
        root.addHandler(handler)
    level = os.environ.get("ECHO_LOG_LEVEL", "WARNING").upper()
    root.setLevel(getattr(logging, level, logging.WARNING))
    root.propagate = False
    _configured = True


def get_logger(component: str) -> logging.Logger:
    """Named logger under the 'echo' hierarchy; level set by
    ECHO_LOG_LEVEL (default WARNING, so production runs stay silent —
    the reference's loggers are similarly opt-in sinks)."""
    _configure_root()
    return logging.getLogger(f"echo.{component}")


def set_log_level(level: str):
    _configure_root()
    logging.getLogger("echo").setLevel(
        getattr(logging, level.upper(), logging.WARNING)
    )


def log_event(logger: logging.Logger, event: str, **fields):
    """Structured one-line event: `event key=value ...` (the reference's
    EventRow-style reporting, kept grep-able)."""
    if fields:
        kv = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
        logger.info("%s %s", event, kv)
    else:
        logger.info("%s", event)


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return v


# ---------------------------------------------------------------------------
# Host asserts (reference Ensure.cs — compiled away outside DEBUG)
# ---------------------------------------------------------------------------


def debug_enabled() -> bool:
    return bool(os.environ.get("ECHO_DEBUG"))


def ensure(condition: bool, message: str = "ensure failed"):
    """Host-side invariant check, active under ECHO_DEBUG=1 (the analogue
    of Ensure.IsTrue, Ensure.cs — a no-op in release builds)."""
    if debug_enabled() and not condition:
        raise AssertionError(message)


# ---------------------------------------------------------------------------
# Device asserts (checkify) — Ensure.cs for jitted code
# ---------------------------------------------------------------------------


def device_checks_enabled() -> bool:
    """Read at TRACE time: flipping ECHO_DEBUG_DEVICE invalidates nothing
    by itself — callers must retrace (run_checked builds its own jit)."""
    return bool(os.environ.get("ECHO_DEBUG_DEVICE"))


_in_checked = False  # True only while run_checked is tracing its program


def dcheck(pred, message: str, **fmt_kwargs):
    """Device-side assertion: no-op unless ECHO_DEBUG_DEVICE=1 AND the
    enclosing program is being traced by `run_checked` (a bare
    checkify.check inside an un-functionalized jit is a trace error, so
    programs that are not being debugged must trace dcheck to nothing).
    Production paths call dcheck freely at zero cost."""
    if not (device_checks_enabled() and _in_checked):
        return
    import jax.numpy as jnp
    from jax.experimental import checkify

    checkify.check(jnp.all(pred), message, **fmt_kwargs)


def run_checked(fn: Callable, *args, **kwargs):
    """Run `fn` with checkify functionalization and raise on any failed
    dcheck. Use for debug renders: e.g.
    `run_checked(lambda: _sample_frame(...))`. Works around lax control
    flow (checkify functionalizes while/scan/cond)."""
    global _in_checked
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(
        lambda: fn(*args, **kwargs), errors=checkify.user_checks
    )
    _in_checked = True
    try:
        # jit caching would reuse a trace from a previous (unchecked) call
        # of the same lambda object; a fresh lambda per call avoids that
        err, out = jax.jit(checked)()
    finally:
        _in_checked = False
    checkify.check_error(err)
    return out
