"""Host allocator tuning for the scene-preparation hot path.

This host (hypervisor-backed VM) provisions private-anonymous pages at
~40-60 MB/s on first touch — THP on or off, madvise or not (measured
r5). glibc hands every multi-MB numpy allocation a fresh mmap and
munmaps it on free, so scene prep pays that fault toll for EVERY large
temporary, every time: a 48 MB alloc+fill chain costs ~0.33 s cold vs
~0.03 s from a recycled arena.

Two-part fix:
  1. `mallopt(M_MMAP_THRESHOLD / M_TRIM_THRESHOLD, 1 GB)` so large
     blocks come from the persistent main arena and freed pages are
     RECYCLED instead of munmapped — each byte of working set then
     faults at most once per process.
  2. A one-time arena pre-touch, run in a DAEMON THREAD started at
     package import (`warm_host_allocator_async`), so the ~10-18 s of
     fault cost overlaps jax import/backend init and host mesh
     generation instead of landing inside the first `prepare_scene`.
     The touch is a single numpy strided store, so it releases the GIL.

No-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_lock = threading.Lock()
_mallopt_done = False
_warm_thread: threading.Thread | None = None


def _apply_mallopt() -> bool:
    global _mallopt_done
    with _lock:
        if _mallopt_done:
            return True
        try:
            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30))
            ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)) and ok
        except Exception:
            return False
        _mallopt_done = ok
        return ok


def _touch(arena_bytes: int) -> None:
    # one pass of first-touch at a predictable time; pages recycle into
    # every later large allocation thanks to the raised trim threshold
    block = np.empty(arena_bytes, np.uint8)
    block[:: 4096] = 0
    del block


def warm_host_allocator(arena_bytes: int | None = None) -> bool:
    """Synchronous variant: mallopt + pre-touch inline (blocks for the
    fault cost unless the async warm already ran). Idempotent."""
    ok = _apply_mallopt()
    if not ok:
        return False
    global _warm_thread
    with _lock:
        if _warm_thread is not None:
            return True  # async warm owns the touch (may still be running)
        _warm_thread = threading.current_thread()
    _touch(_arena_size(arena_bytes))
    return True


def warm_host_allocator_async(arena_bytes: int | None = None) -> None:
    """Start the arena pre-touch in a daemon thread (package-import call
    site). mallopt applies immediately; the touch overlaps jax import/
    backend init. Idempotent."""
    if not _apply_mallopt():
        return
    global _warm_thread
    with _lock:
        if _warm_thread is not None:
            return
        t = threading.Thread(
            target=_touch, args=(_arena_size(arena_bytes),),
            name="echo-host-warm", daemon=True,
        )
        _warm_thread = t
    t.start()


def _arena_size(arena_bytes: int | None) -> int:
    if arena_bytes is None:
        arena_bytes = int(os.environ.get("ECHO_HOST_ARENA_MB", "768")) << 20
    return max(arena_bytes, 0)
