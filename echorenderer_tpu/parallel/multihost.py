"""Multi-host (DCN) scaling scaffolding — SURVEY §2c's second axis.

The single-host path (`parallel/sharding.py`) shards pixels over the ICI
mesh of one process. Across hosts the SAME axis extends over DCN:
`jax.distributed.initialize` stitches every process's chips into one
global device list, the pixel mesh spans all of them, and each process
feeds only its addressable shard of the lane arrays
(`jax.make_array_from_callback`). Nothing else changes — the scene is
replicated (read-only, exactly the property the reference exploits with
its immutable PreparedScene, Aggregation/Preparation/PreparedScene.cs),
per-draw determinism is a pure hash of (seed, pixel, sample, dim)
(utils/rng.py), and only O(1) psum'd scalars cross DCN. The rendered
image is therefore bit-identical for ANY process count — the multi-host
extension of the chip-count invariance pinned in tests/test_sharding.py.

Degenerate (1-process) mode is the CI path: `initialize()` is a no-op
without coordinator configuration and every helper collapses onto the
single-host implementation, so the same code runs un-distributed in tests
and distributed under a launcher that sets the standard JAX cluster
environment (coordinator address, process count, process id).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS, render_epoch_sharded

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Bring up the JAX distributed runtime when multi-process context is
    configured; safe no-op otherwise (returns whether distributed mode is
    active). Context comes from explicit arguments or the standard
    environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, as set by launchers), mirroring
    `jax.distributed.initialize`'s own auto-detection."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or num_processes in (None, 1):
        # single-process: nothing to initialize; jax.process_count() == 1
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def make_global_mesh() -> Mesh:
    """1-D pixel mesh over EVERY device of every process (after
    `initialize`); in single-process mode this equals
    `sharding.make_mesh()`."""
    return Mesh(np.asarray(jax.devices()), (AXIS,))


def process_shard_info(mesh: Mesh) -> tuple[int, int, int]:
    """(process_index, n_processes, devices_per_process) for feeding the
    host-local slice of globally-sharded lane arrays."""
    return jax.process_index(), jax.process_count(), jax.local_device_count()


def render_frame_multihost(
    mesh: Mesh,
    scene,
    resolution,
    *,
    spp: int = 16,
    seed: int = 0,
    evaluator: str = "path",
    bounce_limit: int = 128,
    survivability: float = 2.5,
):
    """Render a frame over a (possibly multi-host) pixel mesh and return
    the full (H, W, C) image on every process.

    Pixels are sharded over the global AXIS; each process computes its
    addressable shards; the final image is allgathered host-side (one
    image-sized DCN transfer per frame — frames/samples are the DCN axis,
    there is no parameter traffic, SURVEY §2c). In single-process mode
    this is exactly `sharding.render_frame_sharded`."""
    width, height = resolution
    s_sum, _, _ = render_epoch_sharded(
        mesh, scene, resolution, seed, 0, spp,
        evaluator=evaluator, bounce_limit=bounce_limit,
        survivability=survivability,
    )
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # every process holds only its shards of the (padded) pixel axis;
        # allgather assembles the full frame everywhere. The gather is in
        # pixel-id order, so the result is bit-identical to the
        # single-host image (chip/process-count invariance).
        s_sum = multihost_utils.process_allgather(s_sum, tiled=True)
    img = np.asarray(s_sum) / float(spp)
    return img.reshape(height, width, -1)
