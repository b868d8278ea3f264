"""Discrete textures: host descriptions + device sampling.

Rebuild of the reference texture layer (Textures/Texture.cs,
Textures/Grids/TextureGrid.cs, ArrayGrid.cs, ImportGrid.cs): a `Texture`
maps uv in [0,1)^2 to RGBA; grids add wrap modes (clamp/repeat/mirror —
IWrapper) and filters (point/bilinear — IFilter). Host objects hold numpy
data; `prepare()` returns a `PreparedGrid` pytree of device arrays whose
`sample_uv` is a branchless batched gather suitable for wavefront shading.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CLAMP = 0
REPEAT = 1
MIRROR = 2

FILTER_POINT = 0
FILTER_BILINEAR = 1

_WRAPS = {"clamp": CLAMP, "repeat": REPEAT, "mirror": MIRROR}
_FILTERS = {"point": FILTER_POINT, "bilinear": FILTER_BILINEAR}


def _wrap_index(i, n: int, mode: int):
    """Wrap integer texel indices into [0, n)."""
    if mode == REPEAT:
        return jnp.mod(i, n)
    if mode == MIRROR:
        period = jnp.mod(i, 2 * n)
        return jnp.where(period < n, period, 2 * n - 1 - period)
    return jnp.clip(i, 0, n - 1)


class PreparedGrid(NamedTuple):
    """Device texture: (H, W, 4) texels + static wrap/filter modes.
    wrap_v defaults to wrap (set separately for equirectangular maps:
    repeat in u, clamp in v so poles don't blend across)."""

    texels: jax.Array  # (H, W, 4) linear RGBA
    wrap: int  # static, u axis
    filter: int  # static
    wrap_v: int = -1  # static, v axis; -1 = same as wrap

    @property
    def _wrap_v(self) -> int:
        return self.wrap if self.wrap_v < 0 else self.wrap_v

    def sample_uv(self, uv: jax.Array) -> jax.Array:
        """uv (..., 2) in [0,1)^2 -> RGBA (..., 4). v=0 is the bottom row
        (the renderer's y-up convention, like the reference's TextureGrid
        ToPosition/ToUV mapping)."""
        h, w = self.texels.shape[0], self.texels.shape[1]
        u = uv[..., 0] * w - 0.5
        v = uv[..., 1] * h - 0.5
        if self.filter == FILTER_POINT:
            iu = _wrap_index(jnp.floor(u + 0.5).astype(jnp.int32), w, self.wrap)
            iv = _wrap_index(jnp.floor(v + 0.5).astype(jnp.int32), h, self._wrap_v)
            return self.texels[iv, iu]
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        fu = (u - u0)[..., None]
        fv = (v - v0)[..., None]
        u0w = _wrap_index(u0, w, self.wrap)
        u1w = _wrap_index(u0 + 1, w, self.wrap)
        v0w = _wrap_index(v0, h, self._wrap_v)
        v1w = _wrap_index(v0 + 1, h, self._wrap_v)
        t00 = self.texels[v0w, u0w]
        t01 = self.texels[v0w, u1w]
        t10 = self.texels[v1w, u0w]
        t11 = self.texels[v1w, u1w]
        top = t00 * (1.0 - fu) + t01 * fu
        bot = t10 * (1.0 - fu) + t11 * fu
        return top * (1.0 - fv) + bot * fv


jax.tree_util.register_pytree_node(
    PreparedGrid,
    lambda g: ((g.texels,), (g.wrap, g.filter, g.wrap_v)),
    lambda aux, xs: PreparedGrid(xs[0], *aux),
)


class Texture:
    """Base host texture. Subclasses implement `data()` -> (H, W, 4) numpy
    RGBA, or override `prepare`/`average` wholesale."""

    def __init__(self, wrap="repeat", filter="bilinear"):
        self.wrap = _WRAPS[wrap] if isinstance(wrap, str) else int(wrap)
        self.filter = _FILTERS[filter] if isinstance(filter, str) else int(filter)
        self._prepared = None

    def data(self) -> np.ndarray:
        raise NotImplementedError

    def prepare(self) -> PreparedGrid:
        if self._prepared is None:
            texels = np.asarray(self.data(), np.float32)
            if texels.ndim == 2:
                texels = texels[..., None]
            if texels.shape[-1] == 1:
                texels = np.repeat(texels, 3, axis=-1)
            if texels.shape[-1] == 3:
                texels = np.concatenate(
                    [texels, np.ones_like(texels[..., :1])], axis=-1
                )
            self._prepared = PreparedGrid(
                texels=jnp.asarray(texels), wrap=self.wrap, filter=self.filter
            )
        return self._prepared

    def average(self) -> np.ndarray:
        """Mean RGBA (reference Texture.Average, used for emissive power
        and material interning)."""
        d = np.asarray(self.data(), np.float32)
        mean = d.reshape(-1, d.shape[-1]).mean(axis=0)
        if mean.shape[0] == 3:
            mean = np.append(mean, 1.0)
        return mean.astype(np.float32)

    def sample_uv(self, uv):
        """Host-side convenience sampling (device path gathers the atlas)."""
        return self.prepare().sample_uv(jnp.asarray(uv))


class ArrayGrid(Texture):
    """A texture over an explicit (H, W, C) array (reference ArrayGrid.cs).
    Row 0 is the bottom of the image."""

    def __init__(self, array, **kw):
        super().__init__(**kw)
        self._array = np.asarray(array, np.float32)

    def data(self):
        return self._array


TextureGrid = ArrayGrid  # reference naming alias (TextureGrid.cs)


class ImportGrid(Texture):
    """Lazily imported image texture (reference ImportGrid.cs); `sRGB=True`
    decodes gamma on load."""

    def __init__(self, path, srgb=True, **kw):
        super().__init__(**kw)
        self.path = str(path)
        self.srgb = bool(srgb)
        self._loaded = None

    def data(self):
        if self._loaded is None:
            from ..io.images import load_image

            img = load_image(self.path)
            if self.srgb and not self.path.lower().endswith((".hdr", ".exr", ".fpi", ".pfm", ".npy")):
                rgb = np.asarray(img[..., :3], np.float32)
                lin = np.where(rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4)
                img = np.concatenate([lin, img[..., 3:]], axis=-1) if img.shape[-1] == 4 else lin
            self._loaded = np.asarray(img, np.float32)
        return self._loaded


class Pure(Texture):
    """Constant color texture (reference Pure.cs)."""

    def __init__(self, color, **kw):
        kw.setdefault("filter", "point")
        super().__init__(**kw)
        c = np.asarray(color, np.float32).reshape(-1)
        if c.shape[0] == 1:
            c = np.repeat(c, 3)
        if c.shape[0] == 3:
            c = np.append(c, 1.0)
        self.color = c.astype(np.float32)

    def data(self):
        return np.broadcast_to(self.color, (1, 1, 4)).copy()

    def average(self):
        return self.color


class GradientTexture(Texture):
    """Linear gradient between two colors along an axis
    (reference GradientTexture.cs)."""

    def __init__(self, start=(0, 0, 0), end=(1, 1, 1), axis=0, resolution=256, **kw):
        super().__init__(**kw)
        self.start = np.asarray(start, np.float32)
        self.end = np.asarray(end, np.float32)
        self.axis = int(axis)  # 0 = u, 1 = v
        self.resolution = int(resolution)

    def data(self):
        t = np.linspace(0.0, 1.0, self.resolution, dtype=np.float32)
        ramp = self.start[None, :] * (1 - t[:, None]) + self.end[None, :] * t[:, None]
        if ramp.shape[-1] == 3:
            ramp = np.concatenate([ramp, np.ones_like(ramp[..., :1])], -1)
        if self.axis == 0:
            return np.broadcast_to(ramp[None, :, :], (1, self.resolution, 4)).copy()
        return np.broadcast_to(ramp[:, None, :], (self.resolution, 1, 4)).copy()


class CacheableTexture(Texture):
    """Evaluates a python function f(u, v) -> color on a grid once and
    caches it (reference CacheableTexture.cs pattern)."""

    def __init__(self, fn, resolution=(256, 256), **kw):
        super().__init__(**kw)
        self.fn = fn
        self.resolution = tuple(resolution)

    def data(self):
        w, h = self.resolution
        u = (np.arange(w, dtype=np.float32) + 0.5) / w
        v = (np.arange(h, dtype=np.float32) + 0.5) / h
        uu, vv = np.meshgrid(u, v)
        out = np.asarray(self.fn(uu, vv), np.float32)
        if out.ndim == 2:
            out = out[..., None]
        if out.shape[-1] == 1:
            out = np.repeat(out, 3, axis=-1)
        if out.shape[-1] == 3:
            out = np.concatenate([out, np.ones_like(out[..., :1])], -1)
        return out
