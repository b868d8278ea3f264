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
golden-ratio) lattices over sample_id, computed exactly in 32-bit fixed
point, then decorrelated across dimensions by the full shuffled-scrambled
recipe (Burley, 'Practical Hash-based Owen Scrambling' 2020):
  1. the SAMPLE INDEX is Owen-shuffled per (pixel, dim) — a dyadic-block-
     preserving permutation, so power-of-2 sample prefixes remain exact
     low-discrepancy sets while different dims get independently paired
     sample orders (random-Latin-hypercube-like pairing);
  2. the OUTPUT value is Owen-scrambled per (pixel, dim/component).
Either step alone is insufficient: a plain Cranley-Patterson rotation (or
a value scramble by itself — LK scrambles stay correlated across keys on
identical inputs) leaves pairs of additive-recurrence dims near a 1D
lattice line u_a - u_b = const, which shows up as structured artifacts
wherever two draws of one sample interact (pixel jitter x first BSDF
direction, lobe pick x direction, ...). tests/test_utils.py pins both the
stratification and the product-space coverage.

Key-space layout: each absolute dim (unique per draw site — see
integrators.CAMERA_DIMS / BOUNCE_DIM_STRIDE) hashes one base key 4*dim;
value-scramble keys are remixes of it with distinct salts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32

# R2 additive recurrence constants (Roberts 2018) in 32-bit fixed point;
# the mod-2^32 multiply IS the fractional part of sample_id * alpha
_ALPHA_1D = np.uint32(round(0.6180339887498949 * 2**32))
_ALPHA_2X = np.uint32(round(0.7548776662466927 * 2**32))
_ALPHA_2Y = np.uint32(round(0.5698402909980532 * 2**32) & 0xFFFFFFFF)


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
    """uint32 -> float32 in [0, 1). Routed through int32 (exact: bits >> 8
    fits in 24 bits) because Mosaic cannot lower uint32 -> float32 — this
    exact function also runs inside the Pallas megakernel, keeping its
    draws bit-identical to the XLA integrators."""
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _bit_reverse(x: jax.Array) -> jax.Array:
    x = (x << 16) | (x >> 16)
    x = ((x & _U32(0x00FF00FF)) << 8) | ((x >> 8) & _U32(0x00FF00FF))
    x = ((x & _U32(0x0F0F0F0F)) << 4) | ((x >> 4) & _U32(0x0F0F0F0F))
    x = ((x & _U32(0x33333333)) << 2) | ((x >> 2) & _U32(0x33333333))
    x = ((x & _U32(0x55555555)) << 1) | ((x >> 1) & _U32(0x55555555))
    return x


def owen_scramble(bits: jax.Array, key: jax.Array) -> jax.Array:
    """Hash-based nested uniform (Owen) scramble of a [0,1) value's bits
    (Laine-Karras hash as tuned by Burley, 'Practical Hash-based Owen
    Scrambling' 2020): a measure-preserving permutation of [0,1) that maps
    dyadic intervals to dyadic intervals, so per-dimension stratification
    survives while cross-dimension lattice structure is destroyed."""
    x = _bit_reverse(bits.astype(_U32))
    key = key.astype(_U32)
    x = x ^ (x * _U32(0x3D20ADEA))
    x = x + key
    x = x * ((key >> 16) | _U32(1))
    x = x ^ (x * _U32(0x05526C56))
    x = x ^ (x * _U32(0x53A22864))
    return _bit_reverse(x)


class SampleStream(NamedTuple):
    """Per-lane deterministic sample stream identity.

    pixel_id: (N,) uint32 — flat pixel index (stable across sharding)
    sample_id: () or (N,) uint32 — sample (path) index within the pixel
    seed: () uint32 — render-wide seed
    """

    pixel_id: jax.Array
    sample_id: jax.Array
    seed: jax.Array

    def _keys(self, dim):
        """Per-(seed, pixel, dim) base key + derived value-scramble keys.
        Absolute dims are unique per draw site, so one hashed base key per
        dim suffices; value keys are cheap remixes with distinct salts."""
        d = jnp.asarray(dim, _U32)
        ks = hash_u32(self.seed, self.pixel_id, d * _U32(4))
        return ks, _mix(ks ^ _U32(0xA511E9B3)), _mix(ks ^ _U32(0x63D83595))

    def next_1d(self, dim) -> jax.Array:
        """Stratified 1D sample in [0, 1). `dim` may be a python int or a
        traced int array (e.g. a bounce-depth-derived dimension)."""
        ks, kv, _ = self._keys(dim)
        idx = owen_scramble(self.sample_id.astype(_U32), ks)  # index shuffle
        return u32_to_uniform(owen_scramble(idx * _ALPHA_1D, kv))

    def next_2d_parts(self, dim) -> tuple[jax.Array, jax.Array]:
        """`next_2d` as an (x, y) component tuple — the form the Pallas
        megakernel consumes (no trailing-axis stacking in-kernel)."""
        ks, kx, ky = self._keys(dim)
        idx = owen_scramble(self.sample_id.astype(_U32), ks)
        ux = u32_to_uniform(owen_scramble(idx * _ALPHA_2X, kx))
        uy = u32_to_uniform(owen_scramble(idx * _ALPHA_2Y, ky))
        return ux, uy

    def next_2d(self, dim) -> jax.Array:
        """Stratified 2D sample in [0, 1)^2. The index shuffle is shared by
        both components (preserving the joint R2 lattice structure); the
        output scrambles are independent."""
        ux, uy = self.next_2d_parts(dim)
        return jnp.stack([ux, uy], axis=-1)

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
