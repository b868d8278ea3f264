"""Discrete CDF-inversion distributions for importance sampling.

Rebuild of the reference's Evaluation/Sampling/DiscreteDistribution1D.cs
(CDF inversion with stable handling of zero-weight bins) and
DiscreteDistribution2D.cs (marginal-over-rows + conditional-per-row, used
by equirectangular environment maps). Build happens on host numpy at scene
preparation; sampling is branchless `searchsorted` gathers on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Distribution1D(NamedTuple):
    """cdf[i] = P(X <= i), inclusive; pdf in 'bin mass' units."""

    cdf: jax.Array  # (N,)
    pmf: jax.Array  # (N,)

    @property
    def size(self) -> int:
        return self.cdf.shape[0]

    def sample(self, u):
        """u in [0,1) -> (index, pmf, remapped u within the bin)."""
        idx = jnp.searchsorted(self.cdf, u, side="right").astype(jnp.int32)
        idx = jnp.clip(idx, 0, self.size - 1)
        pm = self.pmf[idx]
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        remap = jnp.clip((u - lo) / jnp.maximum(self.cdf[idx] - lo, 1e-12), 0.0, 1.0 - 1e-7)
        return idx, pm, remap

    def pmf_of(self, idx):
        return self.pmf[jnp.clip(idx, 0, self.size - 1)]


def build_1d(weights: np.ndarray) -> Distribution1D:
    w = np.maximum(np.asarray(weights, np.float64), 0.0)
    total = w.sum()
    if total <= 0.0:
        w = np.ones_like(w)
        total = w.sum()
    pmf = w / total
    cdf = np.cumsum(pmf)
    cdf[-1] = 1.0
    return Distribution1D(cdf=jnp.asarray(cdf, jnp.float32), pmf=jnp.asarray(pmf, jnp.float32))


class Distribution2D(NamedTuple):
    """Row marginal + per-row conditional over an (H, W) weight grid."""

    marginal_cdf: jax.Array  # (H,)
    marginal_pmf: jax.Array  # (H,)
    conditional_cdf: jax.Array  # (H, W)
    conditional_pmf: jax.Array  # (H, W)

    @property
    def shape(self) -> tuple[int, int]:
        return self.conditional_cdf.shape

    def sample(self, u2):
        """u2 (..., 2) in [0,1)^2 -> (iy, ix, pmf, (uy, ux) remapped)."""
        h, w = self.shape
        uy, ux = u2[..., 0], u2[..., 1]
        iy = jnp.clip(
            jnp.searchsorted(self.marginal_cdf, uy, side="right").astype(jnp.int32), 0, h - 1
        )
        lo_y = jnp.where(iy > 0, self.marginal_cdf[jnp.maximum(iy - 1, 0)], 0.0)
        ry = jnp.clip(
            (uy - lo_y) / jnp.maximum(self.marginal_cdf[iy] - lo_y, 1e-12), 0.0, 1.0 - 1e-7
        )
        rows = self.conditional_cdf[iy]  # (..., W)
        ix = jnp.clip(
            jax.vmap(lambda r, u: jnp.searchsorted(r, u, side="right"))(
                rows.reshape(-1, w), ux.reshape(-1)
            ).reshape(ux.shape).astype(jnp.int32),
            0,
            w - 1,
        )
        cond = self.conditional_pmf[iy, ix]
        lo_x = jnp.where(
            ix > 0,
            jnp.take_along_axis(rows, jnp.maximum(ix - 1, 0)[..., None], -1)[..., 0],
            0.0,
        )
        hi_x = jnp.take_along_axis(rows, ix[..., None], -1)[..., 0]
        rx = jnp.clip((ux - lo_x) / jnp.maximum(hi_x - lo_x, 1e-12), 0.0, 1.0 - 1e-7)
        pmf = self.marginal_pmf[iy] * cond
        return iy, ix, pmf, jnp.stack([ry, rx], axis=-1)

    def pmf_of(self, iy, ix):
        h, w = self.shape
        iy = jnp.clip(iy, 0, h - 1)
        ix = jnp.clip(ix, 0, w - 1)
        return self.marginal_pmf[iy] * self.conditional_pmf[iy, ix]


def build_2d(weights: np.ndarray) -> Distribution2D:
    w = np.maximum(np.asarray(weights, np.float64), 0.0)
    h, wd = w.shape
    row_sum = w.sum(axis=1)
    total = row_sum.sum()
    if total <= 0.0:
        w = np.ones_like(w)
        row_sum = w.sum(axis=1)
        total = row_sum.sum()
    marg_pmf = row_sum / total
    marg_cdf = np.cumsum(marg_pmf)
    marg_cdf[-1] = 1.0
    safe_rows = np.where(row_sum[:, None] > 0.0, w, 1.0)
    cond_pmf = safe_rows / safe_rows.sum(axis=1, keepdims=True)
    cond_cdf = np.cumsum(cond_pmf, axis=1)
    cond_cdf[:, -1] = 1.0
    return Distribution2D(
        marginal_cdf=jnp.asarray(marg_cdf, jnp.float32),
        marginal_pmf=jnp.asarray(marg_pmf, jnp.float32),
        conditional_cdf=jnp.asarray(cond_cdf, jnp.float32),
        conditional_pmf=jnp.asarray(cond_pmf, jnp.float32),
    )
