"""Deterministic counter-based random sampling.

TPU-native replacement for the reference's stateful per-worker PRNG clones
and buffered sample streams (Common/Mathematics/Randomization/SquirrelPrng.cs,
Evaluation/Sampling/ContinuousDistribution.cs, StratifiedDistribution.cs).

The reference guarantees that a pixel's sample stream is identical regardless
of work scheduling by giving each pixel its own seeded stream and drawing
values in deterministic call order. We obtain the same property statelessly:
every random value is a pure hash of (seed, pixel_id, sample_id, dimension),
so any lane of any shard regenerates exactly the same value. Dimensions are
compile-time constants at each draw site (the analogue of the reference's
call-order-keyed buffer indices).

Low-discrepancy: camera/bounce dimensions use additive-recurrence (R2 /
golden-ratio) sequences over sample_id with per-(pixel, dimension)
Cranley-Patterson rotation — matching the stratification quality of the
reference's StratifiedDistribution without its per-series buffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_U32 = jnp.uint32

# golden ratio / R2 additive recurrence constants (Roberts 2018)
_ALPHA_1D = 0.6180339887498949
_ALPHA_2D = (0.7548776662466927, 0.5698402909980532)


def _mix(x: jax.Array) -> jax.Array:
    """Strong 32-bit finalizer (lowbias32-style avalanche)."""
    x = x.astype(_U32)
    x = x ^ (x >> 16)
    x = x * _U32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * _U32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_u32(*parts) -> jax.Array:
    """Combine any number of uint32 arrays/ints into one hashed uint32."""
    h = _U32(0x9E3779B9)
    for p in parts:
        h = _mix(jnp.asarray(p, dtype=_U32) + h * _U32(0x85EBCA6B))
    return h


def u32_to_uniform(bits: jax.Array) -> jax.Array:
    """uint32 -> float32 in [0, 1)."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


class SampleStream(NamedTuple):
    """Per-lane deterministic sample stream identity.

    pixel_id: (N,) uint32 — flat pixel index (stable across sharding)
    sample_id: () or (N,) uint32 — sample (path) index within the pixel
    seed: () uint32 — render-wide seed
    """

    pixel_id: jax.Array
    sample_id: jax.Array
    seed: jax.Array

    def next_1d(self, dim: int) -> jax.Array:
        """Stratified 1D sample in [0, 1) for a static dimension index."""
        cp = u32_to_uniform(hash_u32(self.seed, self.pixel_id, 2 * dim + 1))
        s = self.sample_id.astype(jnp.float32)
        u = s * jnp.float32(_ALPHA_1D) + cp
        return u - jnp.floor(u)

    def next_2d(self, dim: int) -> jax.Array:
        """Stratified 2D sample in [0, 1)^2 for a static dimension index."""
        cpx = u32_to_uniform(hash_u32(self.seed, self.pixel_id, 4 * dim + 2))
        cpy = u32_to_uniform(hash_u32(self.seed, self.pixel_id, 4 * dim + 3))
        s = self.sample_id.astype(jnp.float32)
        ux = s * jnp.float32(_ALPHA_2D[0]) + cpx
        uy = s * jnp.float32(_ALPHA_2D[1]) + cpy
        return jnp.stack([ux - jnp.floor(ux), uy - jnp.floor(uy)], axis=-1)

    def white_1d(self, dim) -> jax.Array:
        """Pure-hash (white noise) 1D sample; dim may be traced (e.g. bounce)."""
        return u32_to_uniform(
            hash_u32(self.seed, self.pixel_id, self.sample_id, dim)
        )

    def white_2d(self, dim) -> jax.Array:
        bits0 = hash_u32(self.seed, self.pixel_id, self.sample_id, dim, 0)
        bits1 = hash_u32(self.seed, self.pixel_id, self.sample_id, dim, 1)
        return jnp.stack([u32_to_uniform(bits0), u32_to_uniform(bits1)], axis=-1)


# --- sample mappings (reference Evaluation/Sampling/Sample2D.cs helpers) ---


def uniform_sphere(u: jax.Array) -> jax.Array:
    """[0,1)^2 -> uniform direction on the unit sphere."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere(u: jax.Array) -> jax.Array:
    """[0,1)^2 -> uniform direction on the +z hemisphere."""
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def concentric_disk(u: jax.Array) -> jax.Array:
    """[0,1)^2 -> concentric mapping to the unit disk (Shirley–Chiu)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    r_big = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(r_big, ox, oy)
    ratio = jnp.where(
        r_big,
        jnp.where(ox != 0.0, oy / jnp.where(ox == 0.0, 1.0, ox), 0.0),
        jnp.where(oy != 0.0, ox / jnp.where(oy == 0.0, 1.0, oy), 0.0),
    )
    theta = jnp.where(
        r_big,
        (jnp.pi / 4.0) * ratio,
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio,
    )
    zero = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def cosine_hemisphere(u: jax.Array) -> jax.Array:
    """[0,1)^2 -> cosine-weighted direction on the +z hemisphere."""
    d = concentric_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def uniform_triangle(u: jax.Array) -> jax.Array:
    """[0,1)^2 -> uniform barycentric (b0, b1) on a triangle (sqrt warp)."""
    s = jnp.sqrt(jnp.maximum(u[..., 0], 0.0))
    return jnp.stack([1.0 - s, u[..., 1] * s], axis=-1)
