"""Directional (environment) textures with importance sampling.

Rebuild of the reference's Textures/Directional layer:
  - CylindricalTexture (CylindricalTexture.cs:16): equirectangular map;
    `Prepare` builds a luminance*sin(theta) 2D CDF so `Sample` draws
    directions proportional to energy; pdf converts bin mass to
    solid-angle density.
  - Cubemap (Cubemap.cs): six-face lookup.
  - ColorfulDirectionalTexture: octant test pattern used by the
    reference's DirectionalTextureTests.

Host classes expose `prepare() -> PreparedDirectional`, a device pytree
with evaluate/sample/pdf/mean_luminance — the contract consumed by
evaluation/scene_ops.py env-light code.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.distributions import Distribution2D, build_2d
from .grids import PreparedGrid, Texture


def _dir_to_equirect_uv(d):
    """Direction -> (u, v): u = azimuth/2pi (atan2(x, z)), v = polar angle/pi
    measured from -y (so v=0 is down, v=1 is up)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    u = jnp.arctan2(x, z) * (0.5 / jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(-y, -1.0, 1.0)) / jnp.pi
    return u, v


def _equirect_uv_to_dir(u, v):
    phi = (u - 0.5) * (2.0 * jnp.pi)
    theta = v * jnp.pi  # from -y
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.sin(phi), -jnp.cos(theta), sin_t * jnp.cos(phi)], axis=-1
    )


class PreparedDirectional(NamedTuple):
    """Equirectangular env map + its energy CDF (device)."""

    grid: PreparedGrid  # (H, W, 4)
    dist: Distribution2D  # over (H, W) luminance*sin bins
    mean_lum: jax.Array  # () scalar

    def evaluate(self, d: jax.Array) -> jax.Array:
        """Radiance along (normalized) direction d (..., 3) -> (..., 3)."""
        u, v = _dir_to_equirect_uv(d)
        return self.grid.sample_uv(jnp.stack([u, v], axis=-1))[..., :3]

    def sample(self, u2: jax.Array):
        """u2 (..., 2) -> (direction (..., 3), solid-angle pdf (...))."""
        h, w = self.dist.shape
        iy, ix, pmf, remap = self.dist.sample(u2)
        v = (iy.astype(jnp.float32) + remap[..., 0]) / h
        u = (ix.astype(jnp.float32) + remap[..., 1]) / w
        d = _equirect_uv_to_dir(u, v)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 1e-8))
        # bin mass -> solid-angle: each bin spans (2pi/W)(pi/H) sin(theta)
        pdf = pmf * (h * w) / (2.0 * jnp.pi * jnp.pi * sin_t)
        return d, pdf

    def pdf(self, d: jax.Array) -> jax.Array:
        """Solid-angle pdf of `sample` returning direction d."""
        h, w = self.dist.shape
        u, v = _dir_to_equirect_uv(d)
        iy = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        pmf = self.dist.pmf_of(iy, ix)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - d[..., 1] ** 2, 1e-8))
        return pmf * (h * w) / (2.0 * jnp.pi * jnp.pi * sin_t)

    def mean_luminance(self):
        return self.mean_lum

    def average(self) -> jax.Array:
        """Mean radiance over the sphere (solid-angle weighted)."""
        h = self.grid.texels.shape[0]
        theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
        weights = jnp.sin(theta)[:, None, None]
        total = jnp.sum(self.grid.texels[..., :3] * weights, axis=(0, 1))
        return total / jnp.maximum(jnp.sum(weights) * self.grid.texels.shape[1], 1e-9)


jax.tree_util.register_pytree_node(
    PreparedDirectional,
    lambda t: ((t.grid, t.dist, t.mean_lum), None),
    lambda _, xs: PreparedDirectional(*xs),
)


class CylindricalTexture(Texture):
    """Equirectangular environment texture (host). Wraps any Texture/array;
    prepare() bakes the grid and its importance CDF
    (reference CylindricalTexture.Prepare)."""

    def __init__(self, source, **kw):
        kw.setdefault("wrap", "repeat")
        super().__init__(**kw)
        self.source = source
        self._prepared_dir = None

    def data(self):
        if isinstance(self.source, Texture):
            return self.source.data()
        return np.asarray(self.source, np.float32)

    def prepare(self) -> PreparedDirectional:
        if self._prepared_dir is None:
            from .grids import CLAMP

            grid = super().prepare()
            grid = grid._replace(wrap_v=CLAMP)  # poles must not wrap
            texels = np.asarray(grid.texels)
            h, w = texels.shape[0], texels.shape[1]
            lum = (
                0.212671 * texels[..., 0]
                + 0.715160 * texels[..., 1]
                + 0.072169 * texels[..., 2]
            )
            theta = (np.arange(h, dtype=np.float32) + 0.5) / h * np.pi
            weights = lum * np.sin(theta)[:, None]
            dist = build_2d(weights)
            sin_sum = float(np.sin(theta).sum()) * w
            mean_lum = float((weights.sum()) / max(sin_sum, 1e-9))
            self._prepared_dir = PreparedDirectional(
                grid=grid, dist=dist, mean_lum=jnp.asarray(mean_lum, jnp.float32)
            )
        return self._prepared_dir


class Cubemap(Texture):
    """Six-face environment map (reference Cubemap.cs). Faces are resampled
    into one equirectangular grid at prepare time so the device path stays
    a single gather; order: +x, -x, +y, -y, +z, -z."""

    def __init__(self, faces, resolution=(512, 256), **kw):
        super().__init__(**kw)
        self.faces = faces
        self.resolution = tuple(resolution)
        self._equirect = None

    def data(self):
        if self._equirect is None:
            w, h = self.resolution
            u = (np.arange(w, dtype=np.float32) + 0.5) / w
            v = (np.arange(h, dtype=np.float32) + 0.5) / h
            uu, vv = np.meshgrid(u, v)
            phi = (uu - 0.5) * 2.0 * np.pi
            theta = vv * np.pi
            d = np.stack(
                [np.sin(theta) * np.sin(phi), -np.cos(theta), np.sin(theta) * np.cos(phi)],
                axis=-1,
            )
            ax, ay, az = np.abs(d[..., 0]), np.abs(d[..., 1]), np.abs(d[..., 2])
            face = np.where(
                (ax >= ay) & (ax >= az),
                np.where(d[..., 0] > 0, 0, 1),
                np.where(ay >= az, np.where(d[..., 1] > 0, 2, 3), np.where(d[..., 2] > 0, 4, 5)),
            )
            out = np.zeros(d.shape[:-1] + (4,), np.float32)
            prepared = []
            for f in self.faces:
                arr = f.data() if isinstance(f, Texture) else np.asarray(f, np.float32)
                if arr.shape[-1] == 3:
                    arr = np.concatenate([arr, np.ones_like(arr[..., :1])], -1)
                prepared.append(arr)
            # face-local (s, t) per cube-face convention
            x, y, z = d[..., 0], d[..., 1], d[..., 2]
            configs = [
                (0, -z, y, ax), (1, z, y, ax),
                (2, x, -z, ay), (3, x, z, ay),
                (4, x, y, az), (5, -x, y, az),
            ]
            for fid, s, t, major in configs:
                m = face == fid
                if not m.any():
                    continue
                arr = prepared[fid]
                fh, fw = arr.shape[:2]
                su = np.clip((s[m] / np.maximum(major[m], 1e-9) + 1) / 2, 0, 1 - 1e-7)
                tv = np.clip((t[m] / np.maximum(major[m], 1e-9) + 1) / 2, 0, 1 - 1e-7)
                out[m] = arr[(tv * fh).astype(np.int64), (su * fw).astype(np.int64)]
            self._equirect = out
        return self._equirect

    def prepare(self) -> PreparedDirectional:
        return CylindricalTexture(self.data(), wrap="repeat").prepare()


class ColorfulDirectionalTexture(Texture):
    """Octant-colored test pattern (the reference's test directional
    texture): color channels encode the sign octant of the direction."""

    def __init__(self, resolution=(128, 64), **kw):
        super().__init__(**kw)
        self.resolution = tuple(resolution)

    def data(self):
        w, h = self.resolution
        u = (np.arange(w, dtype=np.float32) + 0.5) / w
        v = (np.arange(h, dtype=np.float32) + 0.5) / h
        uu, vv = np.meshgrid(u, v)
        phi = (uu - 0.5) * 2.0 * np.pi
        theta = vv * np.pi
        d = np.stack(
            [np.sin(theta) * np.sin(phi), -np.cos(theta), np.sin(theta) * np.cos(phi)],
            axis=-1,
        )
        rgb = (d > 0).astype(np.float32) * 0.75 + 0.25
        return np.concatenate([rgb, np.ones_like(rgb[..., :1])], -1)

    def prepare(self) -> PreparedDirectional:
        return CylindricalTexture(self.data()).prepare()
