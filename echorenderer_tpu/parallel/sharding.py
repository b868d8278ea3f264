"""SPMD multi-chip rendering over a `jax.sharding.Mesh`.

The reference is a single-process shared-memory system: one worker pool
pulls tile procedures off a FIFO queue (Common/Compute/Device.cs,
Operation.cs — SURVEY.md §2c). The TPU-native replacement is SPMD data
parallelism: pixels are sharded across chips over ICI, the prepared scene
(BVH + triangles + materials + light records) is replicated — it is
read-only during evaluation, the same property the reference exploits with
its immutable `PreparedScene` — and scalar statistics are `psum`-reduced.

Determinism: every random draw is a pure hash of
(seed, absolute pixel_id, sample_id, dimension) (utils/rng.py), so the
rendered image is bit-identical for any device count — the analogue of the
reference's guarantee that tile scheduling does not affect the image
(Evaluation/Sampling/ContinuousDistribution.cs per-pixel streams). This is
validated by the chip-count-invariance tests (tests/test_sharding.py).

Axis layout:
  mesh ("px",): pixel shards, the only communicated axis. Accumulator
  state lives sharded; only O(1) scalars (noise metric, statistics
  counters) cross chips via psum. Multi-host scaling shards the same axis
  over DCN; no parameter traffic exists.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..scene.cameras import spawn_rays
from ..scene.prepare import PreparedScene
from ..utils.rng import SampleStream

AXIS = "px"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1D device mesh over the pixel data-parallel axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_pixels(n_pixels: int, n_shards: int) -> int:
    """Padded per-shard pixel count (pixels are padded to a multiple of the
    shard count; padded lanes render pixel 0 and are discarded)."""
    return -(-n_pixels // n_shards)


def _sample_pixels(scene, pixel_id, px, py, seed, sample_start, count, resolution,
                   evaluator="path", bounce_limit=128, survivability=2.5):
    """Accumulate `count` samples for the given pixel lanes. Pure SPMD body:
    identical math on every shard, no cross-chip communication."""
    from ..processes.render import AOV_CHANNELS, EVALUATORS

    n = pixel_id.shape[0]
    pixel_xy = jnp.stack([px, py], axis=-1)

    if evaluator == "path":  # production wavefront integrator
        from ..evaluation.wavefront import sample_frame_wavefront

        return sample_frame_wavefront(
            scene, pixel_id, pixel_xy, resolution,
            seed, jnp.asarray(sample_start, jnp.uint32), count,
            bounce_limit=bounce_limit, survivability=survivability,
        )

    fn = EVALUATORS[evaluator]
    channels = AOV_CHANNELS[evaluator]

    def one_sample(i, carry):
        s_sum, s_sq = carry
        stream = SampleStream(
            pixel_id=pixel_id,
            sample_id=(sample_start + i).astype(jnp.uint32),
            seed=jnp.asarray(seed, jnp.uint32),
        )
        shift = stream.next_2d(0)
        lens = stream.next_2d(1)
        o, d = spawn_rays(scene.camera, pixel_xy, shift, lens, resolution)
        if evaluator == "path_lockstep":
            value = fn(scene, stream, o, d, bounce_limit=bounce_limit, survivability=survivability)
        elif evaluator == "naive":
            value = fn(scene, stream, o, d, bounce_limit=bounce_limit)
        else:
            value = fn(scene, stream, o, d)
        if evaluator in ("path_lockstep", "naive"):
            value = jnp.nan_to_num(value, nan=0.0, posinf=0.0, neginf=0.0)
        return s_sum + value, s_sq + value * value

    init = (jnp.zeros((n, channels)), jnp.zeros((n, channels)))
    return jax.lax.fori_loop(0, count, one_sample, init)


def render_epoch_sharded(
    mesh: Mesh,
    scene: PreparedScene,
    resolution,
    seed: int,
    sample_start: int,
    count: int,
    *,
    evaluator: str = "path",
    bounce_limit: int = 16,
    survivability: float = 2.5,
):
    """One sampling epoch distributed over the mesh.

    Returns (sum, sum_sq) of shape (H*W, C) (gathered/addressable as a
    global sharded array) plus a psum'd scalar sample counter. Compile once
    per (resolution, count) pair; subsequent epochs reuse the executable.
    """
    width, height = resolution
    n = width * height
    n_shards = mesh.devices.size
    per = shard_pixels(n, n_shards)
    padded = per * n_shards

    if evaluator == "path":
        # tile-major lane order (processes/tiles.lane_order): compact pixel
        # tiles per kernel block. Per-pixel draws key on pixel_id, so the
        # image stays bit-identical across lane orders AND shard counts.
        from ..processes.tiles import lane_order

        perm, inv = lane_order(resolution)
        pixel_id = jnp.asarray(np.pad(perm, (0, padded - n)))
    else:
        inv = None
        pixel_id = jnp.arange(padded, dtype=jnp.uint32)
        pixel_id = jnp.where(pixel_id < n, pixel_id, 0)
    px = (pixel_id % width).astype(jnp.int32)
    py = (pixel_id // width).astype(jnp.int32)

    run = _sharded_epoch_fn(
        mesh, tuple(resolution), count, evaluator, bounce_limit, survivability
    )
    s_sum, s_sq, n_samples = run(
        scene, pixel_id, px, py,
        jnp.asarray(seed, jnp.uint32), jnp.asarray(sample_start, jnp.uint32),
    )
    if inv is not None:
        inv_d = jnp.asarray(inv)
        return s_sum[inv_d], s_sq[inv_d], n_samples
    return s_sum[:n], s_sq[:n], n_samples


@functools.lru_cache(maxsize=64)
def _sharded_epoch_fn(mesh, resolution, count, evaluator, bounce_limit, survivability):
    """One jitted executable per (mesh, resolution, count, evaluator, ...)
    combination; seed and sample_start are traced arguments, so the
    multi-epoch loop reuses the same executable every epoch (compiles are
    the dominant cost on this class of host)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P()),
        # constants (BVH stacks, best-hit inits) inside lax.while_loop
        # carries start unvarying and become varying; skip the vma check
        check_vma=False,
    )
    def run(scene_rep, pid, pxs, pys, seed, sample_start):
        s_sum, s_sq = _sample_pixels(
            scene_rep, pid, pxs, pys, seed, sample_start,
            count, resolution, evaluator=evaluator, bounce_limit=bounce_limit,
            survivability=survivability,
        )
        n_samples = jax.lax.psum(
            jnp.asarray(pid.shape[0] * count, jnp.float32), AXIS
        )
        return s_sum, s_sq, n_samples[None]

    return jax.jit(run)


def sample_active_sharded(
    mesh: Mesh,
    scene: PreparedScene,
    ids,
    starts,
    resolution,
    seed: int,
    count: int,
    *,
    bounce_limit: int = 16,
    survivability: float = 2.5,
):
    """One ADAPTIVE epoch over the mesh: an arbitrary compacted set of
    still-noisy pixel lanes (global ids + per-pixel sample starts, the
    same contract as processes.render._sample_active) sharded across
    devices. Lanes are padded to the shard count with duplicates of lane 0
    whose results the caller must mask (the returned arrays keep the
    padded length so callers can reuse the valid mask they built).

    Determinism: per-pixel streams key on (seed, pixel_id, sample_id), so
    the samples are bitwise identical to the single-device adaptive epoch
    for any shard count (tests/test_sharding.py)."""
    n = ids.shape[0]
    n_shards = mesh.devices.size
    # lane-align the per-shard width: odd widths vectorize differently
    # per backend (scalar remainder codegen), breaking the bitwise
    # shard-count invariance this function promises
    per = -(-shard_pixels(n, n_shards) // 128) * 128
    padded = per * n_shards
    width, height = resolution
    ids_p = jnp.concatenate(
        [jnp.asarray(ids, jnp.uint32),
         jnp.broadcast_to(jnp.asarray(ids, jnp.uint32)[:1], (padded - n,))]
    )
    st_p = jnp.concatenate(
        [jnp.asarray(starts, jnp.uint32),
         jnp.broadcast_to(jnp.asarray(starts, jnp.uint32)[:1], (padded - n,))]
    )
    px = (ids_p % width).astype(jnp.int32)
    py = (ids_p // width).astype(jnp.int32)
    run = _sharded_active_fn(
        mesh, tuple(resolution), count, bounce_limit, survivability
    )
    s_sum, s_sq = run(scene, ids_p, px, py, st_p, jnp.asarray(seed, jnp.uint32))
    return s_sum, s_sq


@functools.lru_cache(maxsize=64)
def _sharded_active_fn(mesh, resolution, count, bounce_limit, survivability):
    from ..evaluation.wavefront import sample_frame_wavefront

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    def run(scene_rep, pid, pxs, pys, starts, seed):
        pixel_xy = jnp.stack([pxs, pys], axis=-1)
        return sample_frame_wavefront(
            scene_rep, pid, pixel_xy, resolution, seed, starts, count,
            bounce_limit=bounce_limit, survivability=survivability,
        )

    return jax.jit(run)


def render_frame_sharded(
    mesh: Mesh,
    scene: PreparedScene,
    resolution,
    *,
    spp: int = 16,
    seed: int = 0,
    evaluator: str = "path",
    bounce_limit: int = 16,
    survivability: float = 2.5,
) -> np.ndarray:
    """Render a full frame at fixed spp over the mesh; returns (H, W, C)."""
    width, height = resolution
    s_sum, _, _ = render_epoch_sharded(
        mesh, scene, resolution, seed, 0, spp,
        evaluator=evaluator, bounce_limit=bounce_limit, survivability=survivability,
    )
    img = np.asarray(s_sum) / float(spp)
    return img.reshape(height, width, -1)
